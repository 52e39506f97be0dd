package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable AS-OF join (round 8) — the companion of [[RangeJoin]]: for
  * each left row, attach THE single right row with the greatest
  * `rightTs ≤ leftTs` (backward; `<` when strict) or smallest
  * `rightTs ≥ leftTs` (forward; `>` when strict) sharing the equality
  * keys, optionally within a tolerance window. The pandas
  * `merge_asof` / kdb `aj` / QuestDB `ASOF JOIN` verb.
  *
  * THE SCALE POINT — no join at all: both sides union into one stream
  * tagged with a sort priority, ONE window over (keys ORDER BY ts, pri,
  * tiebreak) carries the right payload to each left row via
  * `last(…, ignoreNulls)` (backward) / `first(…)` (forward). Cost is a
  * single shuffle on the keys + an in-partition sort — no per-pair
  * probe, no BNLJ, no row explosion; this is exactly the shape q11
  * proved oracle-exact (AsofJoinSpec asserts this operator reproduces
  * q11 bit-for-bit, and that no Join node appears in the plan).
  *
  * Tie semantics via the priority: inclusive puts right rows BEFORE
  * left at equal ts (visible to the `-1`-bounded frame), strict puts
  * them after (invisible). Among right rows sharing (key, ts) the
  * `tieBreak` column decides (greatest wins backward, least forward);
  * without one, equal-ts right duplicates are nondeterministic — pass
  * it when the right side can carry duplicates.
  *
  * Column contract (same as RangeJoin): sides share ONLY the `keys`
  * names; output is every left row (unmatched → nulls — left-outer
  * semantics) with the right side's non-key columns attached.
  * Left rows never see other left rows' payload (their right columns
  * are null in the union), so multiple left rows at one timestamp
  * resolve independently and correctly.
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   tolerance: Option[java.time.Duration] = None,
                   strict: Boolean = false,
                   tieBreak: Option[String] = None): DataFrame =
    asof(left, right, keys, leftTs, rightTs, tolerance, strict, tieBreak,
      backward = true)

  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  tolerance: Option[java.time.Duration] = None,
                  strict: Boolean = false,
                  tieBreak: Option[String] = None): DataFrame =
    asof(left, right, keys, leftTs, rightTs, tolerance, strict, tieBreak,
      backward = false)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   tolerance: Option[java.time.Duration], strict: Boolean,
                   tieBreak: Option[String], backward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    keys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"key $k must exist on both sides")
    }
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns must be disjoint (rename first): ${overlap.mkString(", ")}")
    require(left.columns.contains(leftTs), s"$leftTs not in left")
    require(right.columns.contains(rightTs), s"$rightTs not in right")
    tieBreak.foreach(t => require(right.columns.contains(t), s"$t not in right"))

    val lPay = left.columns.filterNot(keys.contains).toSeq
    val rPay = right.columns.filterNot(keys.contains).toSeq
    // a null-timestamp right row would sort FIRST in the window and
    // attach to every left row as the "earliest match" — it can never be
    // a nearest row, so it drops here; null-timestamp LEFT rows survive
    // (left-outer) but match nothing (guard below)
    val rightTs0 = right.filter(col(rightTs).isNotNull)
    // inclusive: right rows visible at equal ts ⇒ right sorts toward the
    // frame (before left when backward, after when forward); strict
    // flips it
    val (lPri, rPri) =
      if (backward) { if (strict) (0, 1) else (1, 0) }
      else          { if (strict) (1, 0) else (0, 1) }

    def side(df: DataFrame, ts: String, pri: Int, own: Seq[String],
             other: DataFrame, others: Seq[String], isLeft: Boolean) =
      df.select(
        keys.map(col) ++
        Seq(col(ts).as("__ats"), lit(pri).as("__pri"),
            lit(isLeft).as("__isl")) ++
        own.map(col) ++
        others.map(c => lit(null).cast(other.schema(c).dataType).as(c)): _*)

    val unioned =
      side(left, leftTs, lPri, lPay, right, rPay, isLeft = true)
        .unionByName(side(rightTs0, rightTs, rPri, rPay, left, lPay, isLeft = false))

    val ord: Seq[Column] =
      Seq(col("__ats"), col("__pri")) ++ tieBreak.map(t => col(t)).toSeq
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val w = if (backward) w0.rowsBetween(Window.unboundedPreceding, -1)
            else w0.rowsBetween(1, Window.unboundedFollowing)
    def carry(c: Column): Column =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)

    var out = unioned
    rPay.foreach { c => out = out.withColumn(s"__asof_$c", carry(col(c))) }
    out = out.filter(col("__isl"))

    // tolerance: a match further than `tol` from the left timestamp is
    // no match at all — every attached column nulls together
    val within: Column = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val micros = tol.toNanos / 1000L
        require(micros > 0, s"tolerance must be positive, got $tol")
        val d =
          if (backward)
            unix_micros(col("__ats").cast("timestamp")) -
              unix_micros(col(s"__asof_$rightTs").cast("timestamp"))
          else
            unix_micros(col(s"__asof_$rightTs").cast("timestamp")) -
              unix_micros(col("__ats").cast("timestamp"))
        col(s"__asof_$rightTs").isNotNull && d <= micros
    }

    out.select(
      keys.map(col) ++ lPay.map(col) ++
      rPay.map(c =>
        when(within && col("__ats").isNotNull, col(s"__asof_$c")).as(c)): _*)
  }
}
