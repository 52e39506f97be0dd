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
