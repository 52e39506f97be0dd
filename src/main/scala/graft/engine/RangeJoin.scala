package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}

/** Reusable banded range join (round 8 — VERDICT r7 #4): the general
  * form of the bucket trick x10 proved, packaged so users writing
  * as-of/band joins stop rediscovering the BNLJ trap.
  *
  * Semantics: pairs where the key columns are equal and
  * `right.ts − left.ts ∈ (0, band]` (strict lower — simultaneous rows
  * do not pair; inclusive upper — the as-of/q10 contract), plus an
  * optional extra residual predicate.
  *
  * THE SCALE POINT: a naive `l.key = r.key AND r.ts BETWEEN …` plans as
  * a hash join on the key alone — every row of a hot key lands on ONE
  * reducer and the per-key work is O(n·m). Here the bucket width is
  * DERIVED FROM THE BAND (one bucket = one band), each left row probes
  * exactly two buckets (its own and the next — a (0, band] window can
  * only land there), and the equi-join key becomes (keys…, bucket):
  *
  *  - pair generation for a hot key spreads across its time buckets —
  *    parallelism follows time, not key cardinality;
  *  - per-task work is O(rows-per-bucket²) instead of O(rows-per-key²);
  *  - Catalyst still plans a plain shuffled/broadcast HASH join — no
  *    custom physical operator, AQE/skew-split/broadcast all apply.
  *
  * Output is bit-identical to the BNLJ form (PlanShapeSpec asserts it
  * at three band widths): a qualifying pair has
  * `floor(r/w) − floor(l/w) ∈ {0, 1}`, so exactly ONE of the two probes
  * matches — no duplicates, no misses, any band width.
  *
  * Columns: both sides must share ONLY the `keys` names; the result is
  * keys ++ left's other columns ++ right's other columns. Timestamp
  * columns band in microseconds; numeric columns band in their own
  * units (both overloads funnel into the same bucket arithmetic).
  */
object RangeJoin {

  /** Timestamp flavor: `band` as a duration. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String,
                band: java.time.Duration,
                extra: Column = lit(true)): DataFrame = {
    val micros = band.toNanos / 1000L
    require(micros > 0, s"band must be positive, got $band")
    joinBanded(left, right, keys, leftTs, rightTs, micros, extra,
      toLong = c => unix_micros(c.cast("timestamp")))
  }

  /** Numeric flavor: `band` in the column's own units. */
  def rangeJoinNumeric(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, band: Long,
                       extra: Column = lit(true)): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    joinBanded(left, right, keys, leftTs, rightTs, band, extra,
      toLong = c => c.cast("long"))
  }

  private def joinBanded(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightTs: String, width: Long,
                         extra: Column, toLong: Column => Column): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one equality key")
    keys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"key $k must exist on both sides")
    }
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns must be disjoint (rename first): ${overlap.mkString(", ")}")
    require(left.columns.contains(leftTs), s"$leftTs not in left")
    require(right.columns.contains(rightTs), s"$rightTs not in right")

    val bkt = "__rj_bkt"
    val probe = "__rj_probe"
    // each left row probes its own bucket and the next: a (0, band]
    // window from anywhere inside bucket b ends inside b or b+1
    val l = left
      .withColumn(bkt, floor(toLong(col(leftTs)) / width))
      .withColumn(probe, explode(array(col(bkt), col(bkt) + 1)))
    val r = right.withColumn(bkt, floor(toLong(col(rightTs)) / width))

    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val bandCond = toLong(r(rightTs)) > toLong(l(leftTs)) &&
      toLong(r(rightTs)) <= toLong(l(leftTs)) + width
    val joined = l.join(r, keyCond && (l(probe) === r(bkt)) && bandCond && extra)

    val leftRest = left.columns.filterNot(keys.contains).toSeq
    val rightRest = right.columns.filterNot(keys.contains).toSeq
    joined.select(
      keys.map(l(_)) ++ leftRest.map(l(_)) ++ rightRest.map(r(_)): _*)
  }
}
