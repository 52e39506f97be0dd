package graft

import org.apache.spark.sql.functions._
import graft.engine.{Tables, ThetaSketches}

/** Theta sketch set algebra vs exact: at fixture cardinalities (≤150
  * distinct users < 2^12 nominal entries) a theta sketch runs in EXACT
  * mode, so estimates must EQUAL the exact counts — a stronger check
  * than a tolerance band, and it still exercises the full distributed
  * aggregation + binary merge + set-operation machinery that the
  * estimated regime uses unchanged.
  */
class ThetaSketchesSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sf0001)

  private lazy val weekly = ThetaSketches
    .weeklySketches(events, "user_id").cache()

  private lazy val exactSets: Map[Int, Set[Long]] = events
    .select(weekofyear(to_date(col("ts"))).as("week"), col("user_id"))
    .distinct().collect()
    .groupBy(_.getInt(0)).map { case (w, rs) => w -> rs.map(_.getLong(1)).toSet }

  test("per-week estimates equal exact distinct counts (exact mode)") {
    val est = weekly.collect()
      .map(r => r.getInt(0) -> math.round(ThetaSketches.estimate(r.getAs[Array[Byte]](1))))
      .toMap
    assert(est.keySet == exactSets.keySet)
    est.foreach { case (w, e) => assert(e == exactSets(w).size, s"week $w") }
  }

  test("intersection and difference equal exact returning/churned users") {
    val flows = ThetaSketches.weekOverWeekFlows(weekly)
    assert(flows.nonEmpty)
    flows.foreach { case (w1, w2, a1, a2, ret, churn) =>
      val s1 = exactSets(w1); val s2 = exactSets(w2)
      assert(a1 == s1.size && a2 == s2.size, s"actives $w1/$w2")
      assert(ret == (s1 & s2).size, s"returning $w1->$w2")
      assert(churn == (s1 -- s2).size, s"churned $w1->$w2")
      // conservation: every week-1 user either returns or churns
      assert(ret + churn == a1)
    }
  }

  test("binary partials merge associatively across repartitions") {
    // 1-partition and 13-partition aggregations must agree bit-for-bit
    // in estimate terms — the mergeability contract that lets the agg
    // run map-side at any parallelism
    val one = ThetaSketches.weeklySketches(events.repartition(1), "user_id")
      .collect().map(r => r.getInt(0) -> math.round(ThetaSketches.estimate(r.getAs[Array[Byte]](1)))).toMap
    val many = ThetaSketches.weeklySketches(events.repartition(13), "user_id")
      .collect().map(r => r.getInt(0) -> math.round(ThetaSketches.estimate(r.getAs[Array[Byte]](1)))).toMap
    assert(one == many)
  }

  test("sketch binaries stay kilobyte-scale") {
    val maxLen = weekly.select(max(length(col("sketch")))).head().getInt(0)
    assert(maxLen > 0 && maxLen < 64 * 1024, s"$maxLen bytes")
  }
}
