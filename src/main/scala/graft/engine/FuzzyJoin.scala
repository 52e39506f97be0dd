package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable CROSS-FRAME fuzzy join (round 8b) — the entity-resolution
  * shape: match rows of `left` to rows of `right` whose `name` is within
  * edit distance `cap`, without the all-pairs BNLJ. Completes the
  * reusable-operator trio with [[RangeJoin]] and [[AsofJoin]]
  * (`Scalars.fuzzyMatchPrefix` is the SELF-join form behind x66).
  *
  * Candidate generation is ED-Join-style prefix filtering, q-gram
  * tokens ranked by GLOBAL rarity over the UNION of both frames — the
  * prefix filter's guarantee (two strings within edit distance `cap`
  * share at least one of each other's `cap·q + 1` rarest grams at the
  * same occurrence index) only holds when both sides rank grams by ONE
  * total order, so the frequency table must span both inputs. Each
  * edit touches at most q grams, so ≤ cap·q grams can differ; keeping
  * the cap·q + 1 rarest per string makes a fully-disjoint prefix pair
  * impossible for a true match. Strings too short to carry that many
  * grams (len ≤ cap·q + q − 1) fall back to block-local all-pairs
  * between the two short subsets — bounded by the short tails, never
  * the corpora. Every candidate is verified with the thresholded
  * `levenshtein(_, _, cap)` (banded DP, O(cap·len) per pair).
  *
  * Inputs must expose columns `id`, `name`, `block` (block = a hard
  * equality partition like brand/category — candidates never cross
  * blocks; pass a constant for unblocked matching, accepting the wider
  * candidate space). Output: (id_a, id_b, name_a, name_b, dist) with
  * id_a from `left`, id_b from `right`, dist ≤ cap — pairs only ACROSS
  * the frames, deterministic order.
  *
  * At 100 TB: one shuffle on (block, gram, occ) for candidates — rare
  * grams by construction, so bucket fan-out stays small; the global
  * freq table is a map-side-combinable count; verification touches
  * candidates only. Compare `Scalars.q66Sql`'s BNLJ, quadratic per
  * block.
  */
object FuzzyJoin {

  def fuzzyJoin(left: DataFrame, right: DataFrame,
                cap: Int = 3, q: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(q >= 1, s"q must be >= 1, got $q")
    val prefixLen = cap * q + 1
    val shortLen = cap * q + q - 1

    def prep(df: DataFrame, side: String): DataFrame =
      df.select(col("id"), col("name"), col("block"),
        length(col("name")).as("len"), lit(side).as("side"))

    val both = prep(left, "a").unionByName(prep(right, "b"))

    // occurrence-indexed q-gram tokens over BOTH frames
    val toks = both
      .filter(col("len") >= q)
      .select(col("side"), col("id"), col("block"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - $q + 1), i -> substring(name, i, $q))")))
      .withColumnRenamed("col", "gram")
      .withColumn("occ", row_number().over(
        Window.partitionBy("side", "id", "gram").orderBy("pos")))
      .drop("pos")
    // ONE global rarity order spanning both frames (see Scaladoc)
    val freq = toks.groupBy("gram", "occ").agg(count(lit(1)).as("freq"))
    val prefix = toks
      .join(freq, Seq("gram", "occ"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("side", "id").orderBy(col("freq"), col("gram"), col("occ"))))
      .filter(col("rank") <= prefixLen)
      .select("side", "id", "block", "len", "gram", "occ")
      .localCheckpoint(eager = false)

    val pa = prefix.filter(col("side") === "a").select(
      col("block"), col("gram"), col("occ"),
      col("id").as("id_a"), col("len").as("len_a"))
    val pb = prefix.filter(col("side") === "b").select(
      col("block").as("block_b"), col("gram").as("gram_b"),
      col("occ").as("occ_b"), col("id").as("id_b"), col("len").as("len_b"))
    val prefixCands = pa.join(pb,
        col("block") === col("block_b") && col("gram") === col("gram_b") &&
        col("occ") === col("occ_b") &&
        abs(col("len_a") - col("len_b")) <= cap)
      .select("id_a", "id_b")

    // short×ANY residue: a string with ≤ cap·q grams can have EVERY gram
    // destroyed by cap edits, so a true (short, long) pair may share no
    // token at all — the residue must pair each short with every
    // length-compatible partner in its block (both directions), not just
    // with other shorts. Cost stays bounded by |short tail| × block.
    val allA = prep(left, "a")
      .select(col("id").as("id_a"), col("block"), col("len").as("len_a"))
    val allB = prep(right, "b")
      .select(col("id").as("id_b"), col("block").as("block_b"),
        col("len").as("len_b"))
    def residue(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("block") === col("block_b") &&
          abs(col("len_a") - col("len_b")) <= cap)
        .select("id_a", "id_b")
    val shortCands =
      residue(allA.filter(col("len_a") <= shortLen), allB)
        .union(residue(allA, allB.filter(col("len_b") <= shortLen)))

    val na = left.select(col("id").as("id_a"), col("name").as("name_a"))
    val nb = right.select(col("id").as("id_b"), col("name").as("name_b"))
    prefixCands.union(shortCands).distinct()
      .join(na, "id_a")
      .join(nb, "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), cap))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
      .orderBy("id_a", "id_b")
  }
}
