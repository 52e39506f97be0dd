package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

/** KLL quantile sketches (round 7b) — the PERCENTILE member of the
  * persisted-sketch suite ([[Sketches]] HLL distinct, [[ThetaSketches]]
  * set algebra): one mergeable, fixed-size sketch per (day, group)
  * answers "p50/p95/p99 latency over ANY period" by lossless-ish merge,
  * without re-scanning raw events and without percentile_cont's
  * every-value ObjectHashAggregate buffer (the hot-group OOM that x69
  * documents in-query; this is the PERSISTED artifact across queries).
  *
  * Spark 4 exposes approx_percentile (in-query only — its intermediate
  * is not a storable column) and no KLL SQL surface, so the aggregation
  * is a typed Aggregator over the DataSketches KLL library on Spark's
  * classpath (no-built-in policy, same as theta/NFKC). Merge is a real
  * two-phase agg: per-partition KllDoublesSketch, binary merges
  * reduce-side and across the stored rollup.
  *
  * KLL error is on RANK (k=200 → ~1.65% normalized rank error, 99%
  * confidence), not on the value — the spec therefore checks rank
  * distance: the estimated quantile's true rank must sit within 2% of
  * the requested rank, the correct acceptance criterion for any
  * quantile sketch (value-distance bounds are meaningless on skewed
  * data).
  */
object QuantileSketches {

  private val K = 200 // DataSketches default accuracy/size trade-off

  class KllAgg extends Aggregator[java.lang.Double, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    private def heapify(b: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(b))
    override def reduce(buf: Array[Byte], v: java.lang.Double): Array[Byte] = {
      val s = if (buf.isEmpty) KllDoublesSketch.newHeapInstance(K) else heapify(buf)
      if (v != null) s.update(v.doubleValue())
      s.toByteArray
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val s = heapify(a)
      s.merge(heapify(b))
      s.toByteArray
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The KLL aggregation as a Column (usable in any groupBy). */
  def kllAgg(c: Column): Column = udaf(new KllAgg).apply(c)

  /** Per-(day) KLL sketches of `valueCol` — the persistable rollup. */
  def dailySketches(events: DataFrame, valueCol: String): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(kllAgg(col(valueCol).cast("double")).as("sketch"),
           count(lit(1)).as("n_events"))

  private def heapify(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  /** Merge a set of sketch binaries and read quantiles off the union —
    * O(|sketches|), never re-reads raw events.
    */
  def quantilesOfUnion(sketches: Seq[Array[Byte]], qs: Seq[Double]): Seq[Double] = {
    val merged = sketches.filter(_.nonEmpty).map(heapify)
      .reduceOption { (a, b) => a.merge(b); a }
    merged match {
      case None    => qs.map(_ => Double.NaN)
      case Some(s) => qs.map(q => s.getQuantile(q))
    }
  }

  /** The true (exact) normalized rank of `value` within a sketch's
    * underlying distribution estimate — used by the spec's rank-distance
    * acceptance check.
    */
  def rankOf(sketch: Array[Byte], value: Double): Double =
    heapify(sketch).getRank(value)
}
