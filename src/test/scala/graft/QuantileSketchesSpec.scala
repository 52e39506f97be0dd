package graft

import org.apache.spark.sql.functions._
import graft.engine.{QuantileSketches, Tables}

/** KLL rollups: rank-distance accuracy (the correct acceptance test for
  * a quantile sketch), merge associativity across partitionings, and
  * the rollup path answering period quantiles without raw re-scans.
  */
class QuantileSketchesSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sf0001)
  private lazy val daily = QuantileSketches.dailySketches(events, "value").cache()
  private lazy val exactValues: Array[Double] =
    events.select(col("value").cast("double")).collect().map(_.getDouble(0)).sorted

  private def trueRank(v: Double): Double =
    exactValues.count(_ <= v).toDouble / exactValues.length

  test("union-of-daily quantiles sit within 2% rank distance of exact") {
    val sketches = daily.select("sketch").collect().map(_.getAs[Array[Byte]](0)).toSeq
    val qs = Seq(0.1, 0.5, 0.9, 0.95, 0.99)
    val est = QuantileSketches.quantilesOfUnion(sketches, qs)
    qs.zip(est).foreach { case (q, v) =>
      assert(math.abs(trueRank(v) - q) <= 0.02,
        s"q=$q estimate=$v trueRank=${trueRank(v)}")
    }
  }

  test("merge is associative across partitionings") {
    val one = QuantileSketches.dailySketches(events.repartition(1), "value")
      .select("sketch").collect().map(_.getAs[Array[Byte]](0)).toSeq
    val many = QuantileSketches.dailySketches(events.repartition(13), "value")
      .select("sketch").collect().map(_.getAs[Array[Byte]](0)).toSeq
    // estimates (not bytes — internal compaction order may differ) agree
    // to rank tolerance at every probe quantile
    val qs = (1 to 19).map(_ / 20.0)
    val a = QuantileSketches.quantilesOfUnion(one, qs)
    val b = QuantileSketches.quantilesOfUnion(many, qs)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(trueRank(x) - trueRank(y)) <= 0.02, s"$x vs $y") }
  }

  test("per-day sketches answer per-day medians within rank tolerance") {
    val rows = daily.collect()
    assert(rows.length > 5)
    val perDayExact = events
      .select(to_date(col("ts")).as("day"), col("value").cast("double").as("v"))
      .collect().groupBy(_.getDate(0).toString)
      .map { case (d, rs) => d -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val day = r.getDate(0).toString
      val med = QuantileSketches.quantilesOfUnion(
        Seq(r.getAs[Array[Byte]]("sketch")), Seq(0.5)).head
      val vs = perDayExact(day)
      val rank = vs.count(_ <= med).toDouble / vs.length
      assert(math.abs(rank - 0.5) <= 0.05, s"$day median=$med rank=$rank")
    }
  }

  test("sketch binaries stay kilobyte-scale") {
    val maxLen = daily.select(max(length(col("sketch")))).head().getInt(0)
    assert(maxLen > 0 && maxLen < 64 * 1024, s"$maxLen bytes")
  }
}
