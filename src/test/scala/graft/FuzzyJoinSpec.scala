package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{FuzzyJoin, Tables}

/** The reusable cross-frame fuzzy join (round 8b): candidates via
  * rarity-ranked q-gram prefix filtering over the UNION of both frames,
  * short×any residue, thresholded-levenshtein verify. Ground truth is
  * the all-pairs BNLJ the operator replaces — parity must hold exactly,
  * at several caps, including the adversarial short-vs-long pair whose
  * every gram is destroyed by the edits.
  */
class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(a: DataFrame, b: DataFrame, cap: Int): Set[(Long, Long, Int)] =
    a.select(col("id").as("id_a"), col("name").as("name_a"),
        col("block").as("bl_a"))
      .crossJoin(b.select(col("id").as("id_b"), col("name").as("name_b"),
        col("block").as("bl_b")))
      .filter(col("bl_a") === col("bl_b") &&
        levenshtein(col("name_a"), col("name_b")) <= cap)
      .select("id_a", "id_b", "name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  private def fuzzy(a: DataFrame, b: DataFrame, cap: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.fuzzyJoin(a, b, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  test("exact parity with the all-pairs BNLJ on the part fixtures, caps 1..3") {
    val part = Tables.part(spark, sf0001).select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("block"))
    // split the corpus into two frames by key parity — a realistic
    // two-source entity-resolution shape with true matches across
    val a = part.filter(col("id") % 2 === 0)
    val b = part.filter(col("id") % 2 === 1)
    (1 to 3).foreach { cap =>
      val expected = brute(a, b, cap)
      val got = fuzzy(a, b, cap)
      assert(got == expected,
        s"cap=$cap: missing=${expected -- got} spurious=${got -- expected}")
    }
  }

  test("adversarial short-vs-long: every gram destroyed, the residue still finds it") {
    // cap=3, q=2: "abcdefg" (len 7 = shortLen, 6 grams) vs a partner at
    // distance 3 whose edits wipe all 6 grams — prefix filtering alone
    // CANNOT see this pair; the short×any residue must
    val a = Seq((1L, "abcdefg", "x")).toDF("id", "name", "block")
    val b = Seq((10L, "aXcdeYgZ", "x"),   // dist 3 from abcdefg, len 8
                (11L, "zzzzzzzz", "x"),   // far away, same block
                (12L, "abcdefg", "y")     // identical but another block
      ).toDF("id", "name", "block")
    assert(brute(a, b, 3) == Set((1L, 10L, 3)), "fixture sanity")
    assert(fuzzy(a, b, 3) == Set((1L, 10L, 3)))
  }

  test("pairs never cross blocks and never form within one frame") {
    val a = Seq((1L, "widget alpha", "b1"), (2L, "widget alphb", "b1"))
      .toDF("id", "name", "block")
    val b = Seq((3L, "widget alphc", "b1"), (4L, "widget alpha", "b2"))
      .toDF("id", "name", "block")
    val got = fuzzy(a, b, 2)
    // 1-3 and 2-3 match within b1; 4 is blocked away; the a-side pair
    // (1,2) must NOT appear — this is a cross join, not a self join
    assert(got == Set((1L, 3L, 1), (2L, 3L, 1)), got.toString)
  }

  test("the candidate stage is hash joins, never a nested-loop product") {
    val part = Tables.part(spark, sf0001).select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("block"))
    val a = part.filter(col("id") % 2 === 0)
    val b = part.filter(col("id") % 2 === 1)
    val plan = FuzzyJoin.fuzzyJoin(a, b, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"fuzzy join must not plan an all-pairs product:\n$plan")
  }
}
