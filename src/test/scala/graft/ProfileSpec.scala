package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sources.Profile

/** One-pass profiling: stats match ground truth, the plan is a single
  * aggregation (one scan), and drift flags what changed between
  * generations.
  */
class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile matches ground truth on orders, in one scan") {
    val orders = Tables.orders(spark, sf0001)
    val p = Profile.profile(orders)
    val rows = p.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val n = orders.count()
    assert(rows("o_orderkey")._1 == n)
    assert(rows.values.forall(_._2 == 0L), "fixture has no nulls")
    // HLL default rsd is 5%; realized error on 1.5k keys can run ~2 sigma
    assert(math.abs(rows("o_orderkey")._3 - n).toDouble / n < 0.10)
    assert(rows("o_orderstatus")._4 == "F" && rows("o_orderstatus")._5 == "P")
    // one job, one scan: the agg rides a single FileSourceScan
    val agg = orders.agg(count(lit(1)),
      orders.schema.fields.flatMap(f => Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)),
        approx_count_distinct(col(f.name)))): _*)
    val scans = agg.queryExecution.sparkPlan.collectLeaves().size
    assert(scans == 1, s"profile must be one scan, found $scans")
  }

  test("drift surfaces row growth, new nulls, and cardinality collapse") {
    val gen1 = Seq((1L, Some("a"), "x"), (2L, Some("b"), "y"), (3L, Some("c"), "z"))
      .toDF("id", "v", "w")
    // gen2: doubled rows, v grows nulls, w collapses to one value
    val gen2 = Seq(
      (1L, Some("a"), "x"), (2L, Option.empty[String], "x"),
      (3L, Option.empty[String], "x"), (4L, Some("d"), "x"),
      (5L, Some("e"), "x"), (6L, Option.empty[String], "x"))
      .toDF("id", "v", "w")
    val d = Profile.drift(Profile.profile(gen1), Profile.profile(gen2))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("id").getAs[Double]("row_ratio") == 2.0)
    assert(d("v").getAs[Double]("null_rate_delta") == 0.5)
    assert(d("w").getAs[Double]("distinct_ratio") < 0.5)
  }
}
