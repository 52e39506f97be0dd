package graft

import org.apache.spark.sql.functions._
import graft.engine.{Sketches, Tables}

/** HLL sketch rollups: union-losslessness (the property that makes
  * persisted sketch tables answer ANY period without re-scanning raw
  * events), bounded error vs exact, and re-aggregability.
  */
class SketchesSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sf0001)

  test("union of daily sketches == one direct sketch (lossless merge)") {
    val daily = Sketches.dailySketches(events, "user_id")
    assert(Sketches.estimateUnion(daily) ==
      Sketches.directEstimate(events, "user_id"))
  }

  test("estimates are within 5% of exact, per day and overall") {
    val daily = Sketches.dailySketches(events, "user_id").cache()
    try {
      val exactTotal = events.select(countDistinct(col("user_id")))
        .head().getLong(0)
      val est = Sketches.estimateUnion(daily)
      assert(math.abs(est - exactTotal).toDouble / exactTotal <= 0.05,
        s"union estimate $est vs exact $exactTotal")
      // per-day: join sketch estimates against exact per-day distincts
      val perDay = daily.withColumn("est", expr("hll_sketch_estimate(sketch)"))
        .select("day", "est")
      val exact = events.groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("exact"))
      val bad = perDay.join(exact, "day")
        .filter(abs(col("est") - col("exact")) > col("exact") * 0.05 + lit(1))
        .count()
      assert(bad == 0, s"$bad days exceed the 5% error bound")
    } finally daily.unpersist()
  }

  test("daily → weekly rollup keeps re-aggregability and accuracy") {
    val daily = Sketches.dailySketches(events, "user_id")
    val weekly = Sketches.rollup(daily, weekofyear(col("day")))
    // weekly rollup-of-rollups equals direct weekly sketches
    val direct = events
      .groupBy(weekofyear(to_date(col("ts"))).as("period"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("direct_est"))
    val mismatches = weekly.join(direct, "period")
      .filter(col("n_distinct_est") =!= col("direct_est")).count()
    assert(mismatches == 0, "weekly union-of-daily != direct weekly sketch")
    // and the weekly layer unions on up to the same global estimate
    assert(Sketches.estimateUnion(weekly.select("sketch", "n_events")) ==
      Sketches.directEstimate(events, "user_id"))
  }

  test("sketches are kilobyte-scale artifacts (the rollup stays tiny)") {
    val daily = Sketches.dailySketches(events, "user_id")
    val maxLen = daily.select(max(length(col("sketch")))).head().getInt(0)
    assert(maxLen > 0 && maxLen < 64 * 1024,
      s"sketch binary unexpectedly large: $maxLen bytes")
  }

  test("x13 twin: per-status estimates within 5% of q13's exact distincts") {
    val est = Sketches.x13(spark, sf0001)
      .select(col("o_orderstatus"), col("n_cust_est"))
    val exact = graft.engine.Aggregates.q13(spark, sf0001)
      .select(col("o_orderstatus"), col("n_cust"))
    val bad = est.join(exact, "o_orderstatus")
      .filter(abs(col("n_cust_est") - col("n_cust")) > col("n_cust") * 0.05 + lit(1))
      .count()
    assert(bad == 0)
  }
}
