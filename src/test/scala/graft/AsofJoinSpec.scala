package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{AsofJoin, Relational, Tables}

/** The reusable as-of operator: bit-parity with the oracle-checked q11,
  * parity with a naive join+row_number reference for every variant
  * (strict / tolerance / forward), and the scale contract — the plan
  * contains NO join node at all (one keys-shuffle window).
  */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def events = Tables.events(spark, sf0001)

  private def purchases: DataFrame = events
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))

  private def views: DataFrame = events
    .filter(col("event_type") === "view")
    .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))

  /** Naive reference: join all candidate pairs, keep rank-1 by the
    * as-of preference order, left-outer to preserve unmatched rows.
    */
  private def reference(cmp: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                        backward: Boolean): Set[(Long, Long, Option[Long])] = {
    val pairs = purchases.join(views, Seq("user_id"))
      .where(cmp(col("v_ts"), col("p_ts")))
    val ord = if (backward) Seq(col("v_ts").desc, col("v_id").desc)
              else Seq(col("v_ts").asc, col("v_id").asc)
    val best = pairs.withColumn("rn",
        row_number().over(Window.partitionBy("user_id", "p_id").orderBy(ord: _*)))
      .filter(col("rn") === 1).select("user_id", "p_id", "v_id")
    purchases.join(best, Seq("user_id", "p_id"), "left")
      .select("user_id", "p_id", "v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
  }

  private def got(df: DataFrame): Set[(Long, Long, Option[Long])] =
    df.select("user_id", "p_id", "v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("backward inclusive ≡ join+rank reference; strict and forward variants too") {
    val back = AsofJoin.asofBackward(purchases, views, Seq("user_id"),
      "p_ts", "v_ts", tieBreak = Some("v_id"))
    assert(got(back) == reference(_ <= _, backward = true))
    assert(back.count() == purchases.count(), "every left row must survive")

    val strict = AsofJoin.asofBackward(purchases, views, Seq("user_id"),
      "p_ts", "v_ts", strict = true, tieBreak = Some("v_id"))
    assert(got(strict) == reference(_ < _, backward = true))

    val fwd = AsofJoin.asofForward(purchases, views, Seq("user_id"),
      "p_ts", "v_ts", tieBreak = Some("v_id"))
    assert(got(fwd) == reference((v, p) => v >= p, backward = false))

    val fwdStrict = AsofJoin.asofForward(purchases, views, Seq("user_id"),
      "p_ts", "v_ts", strict = true, tieBreak = Some("v_id"))
    assert(got(fwdStrict) == reference((v, p) => v > p, backward = false))
  }

  test("tolerance nulls out matches beyond the window, all columns together") {
    val tol = java.time.Duration.ofMinutes(30)
    val bounded = AsofJoin.asofBackward(purchases, views, Seq("user_id"),
      "p_ts", "v_ts", tolerance = Some(tol), tieBreak = Some("v_id"))
    // reference: same rank-1 view, kept only when within 30 minutes
    val refAll = reference(_ <= _, backward = true)
    def millis(r: org.apache.spark.sql.Row): Long = // events ts is NTZ → LocalDateTime
      r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val tsOf = views.select("v_id", "v_ts").collect()
      .map(r => r.getLong(0) -> millis(r)).toMap
    val pTs = purchases.select("p_id", "p_ts").collect()
      .map(r => r.getLong(0) -> millis(r)).toMap
    val expected = refAll.map { case (u, p, v) =>
      (u, p, v.filter(id => pTs(p) - tsOf(id) <= tol.toMillis))
    }
    assert(got(bounded) == expected)
    assert(bounded.count() == purchases.count())
    // the match ts nulls together with the id
    val rows = bounded.collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("v_id")) ==
      r.isNullAt(r.fieldIndex("v_ts"))))
  }

  test("null timestamps: right nulls never match, left nulls survive unmatched") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, null.asInstanceOf[java.sql.Timestamp], "l2")
    ).toDF("k", "l_ts", "l_tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r1"),
      (1L, null.asInstanceOf[java.sql.Timestamp], "rNULL")
    ).toDF("k", "r_ts", "r_tag")
    val out = AsofJoin.asofBackward(l, r, Seq("k"), "l_ts", "r_ts",
        tieBreak = Some("r_tag"))
      .collect().map(x => (x.getString(2),
        if (x.isNullAt(4)) None else Some(x.getString(4)))).toMap
    // l1's nearest is r1 — NOT the null-ts row (which would sort first
    // and shadow as "earliest"); the null-ts left row matches nothing
    // but survives (left-outer)
    assert(out == Map("l1" -> Some("r1"), "l2" -> None), out.toString)
  }

  test("operator reproduces the oracle-checked q11 bit-for-bit, with NO join in the plan") {
    val l = purchases.select(col("user_id"), col("p_ts").as("purchase_ts"),
      col("p_id").as("purchase_id"))
    val r = views.select(col("user_id"), col("v_ts").as("prior_view_ts"),
      col("v_id").as("prior_view_id"))
    val viaOp = AsofJoin.asofBackward(l, r, Seq("user_id"),
        "purchase_ts", "prior_view_ts", tieBreak = Some("prior_view_id"))
      .select("user_id", "purchase_id", "purchase_ts",
              "prior_view_id", "prior_view_ts")
      .orderBy("purchase_id")
    val q11 = Relational.q11(spark, sf0001)
    assert(viaOp.collect().toSeq == q11.collect().toSeq)
    val plan = viaOp.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must plan as a window, not a join:\n" + plan)
  }
}
