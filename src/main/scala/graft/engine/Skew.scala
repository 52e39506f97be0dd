package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SURVEY §4.2 / task brief):
  * AQE's skew-join split handles sort-merge cases automatically at runtime;
  * salting is the explicit, planner-independent tool when one join key
  * dominates (the "null key" / "power user" / stopword problem).
  *
  * saltedJoin: the skewed (large) side gets a deterministic salt in
  * [0, salts) derived from a high-cardinality disambiguator column, so one
  * hot key's rows spread across `salts` shuffle partitions; the small side
  * is replicated `salts` times (explode over the salt range). Equi-join on
  * (key, salt) then behaves as if the hot key were `salts` distinct keys.
  * Cost: small side inflates ×salts — use only when smallSide × salts
  * still fits comfortably per-partition (at 100 TB that's exactly the
  * dimension-table case where skew shows up).
  */
object Skew {

  /** Inner equi-join of `large` (skewed) with `small` on `key`, salted
    * `salts` ways. `disambig` is any column of `large` whose values vary
    * within a key group (a row id, timestamp, …) — the salt must be
    * deterministic (no rand(), SURVEY §2.0.9) yet spread rows uniformly.
    */
  /** The deterministic salt derivation shared by every salted operator
    * (exposed so tests exercise THIS formula, not a copy).
    */
  def salt(disambig: Column, salts: Int): Column =
    pmod(xxhash64(disambig), lit(salts.toLong)).cast("int")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 disambig: String, salts: Int): DataFrame = {
    require(salts > 0)
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs already carry a __salt column — it would be clobbered")
    val saltedLarge = large.withColumn("__salt", salt(col(disambig), salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Skew-safe all-pairs SELF-join: every pair of rows sharing `key` with
    * `idCol`(a) < `idCol`(b), without ever co-locating one key's whole
    * group on a single reducer.
    *
    * A plain self-equi-join on `key` sends each key group to one shuffle
    * partition and generates its O(|group|²) pairs there — the stopword /
    * power-user hazard. Here each row gets a deterministic group
    * g = hash(id) mod `groups`, and the pair space of a key is tiled into
    * the upper-triangle grid of group pairs (i ≤ j). Each row is
    * replicated `groups` times, once per grid cell its group participates
    * in; the join key is (key, cell_i, cell_j), so a hot key's pairs
    * spread over groups·(groups+1)/2 cells ≈ groups²/2 reducers. The
    * residual predicate cell == (min(g_a,g_b), max(g_a,g_b)) makes every
    * pair match in EXACTLY one cell (without it, two rows of the same
    * group would meet in all `groups` cells of that group's row/column).
    *
    * Output: one row per qualifying pair, with every non-key column
    * duplicated as <name>_a / <name>_b. Cost: ×groups row replication —
    * use for the hot slice only (the caller splits hot/cold; see
    * LlmOps.jaccardPairs).
    */
  def gridPairJoin(df: DataFrame, key: String, idCol: String, groups: Int): DataFrame = {
    require(groups > 0)
    val payload = df.columns.filter(_ != key).toSeq
    def side(tag: String): DataFrame = {
      val renamed = payload.foldLeft(df) { (d, c) => d.withColumnRenamed(c, s"${c}_$tag") }
      renamed
        .withColumn(s"__g_$tag", salt(col(s"${idCol}_$tag"), groups))
        .withColumn("__k", explode(sequence(lit(0), lit(groups - 1))))
        .withColumn(s"__ci_$tag", least(col(s"__g_$tag"), col("__k")))
        .withColumn(s"__cj_$tag", greatest(col(s"__g_$tag"), col("__k")))
        .drop("__k")
    }
    val a = side("a")
    val b = side("b").withColumnRenamed(key, s"${key}_b")
    a.join(b,
        col(key) === col(s"${key}_b") &&
        col("__ci_a") === col("__ci_b") && col("__cj_a") === col("__cj_b") &&
        col("__ci_a") === least(col("__g_a"), col("__g_b")) &&
        col("__cj_a") === greatest(col("__g_a"), col("__g_b")) &&
        col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(key) +: payload.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))): _*)
  }

  /** Two-stage skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates Spark's own
    * partial+final hash agg already does this per-partition; the explicit
    * form matters for high-cardinality-accumulator aggregates
    * (collect_list/distinct counting) where one hot key would otherwise
    * concentrate on a single reducer.
    */
  def saltedCountDistinct(df: DataFrame, key: String, distinctCol: String,
                          salts: Int): DataFrame = {
    require(!df.columns.contains("__salt"),
      "input already carries a __salt column — it would be clobbered")
    val salted = df.withColumn("__salt", salt(col(distinctCol), salts))
    // stage 1: per (key, salt) distinct sets are disjoint because the salt
    // is a pure function of the distinct-counted value
    salted
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"n_distinct_$distinctCol"))
  }
}
