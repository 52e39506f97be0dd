package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => DsSketches, UpdateSketch}

/** Theta distinct sketches (round 7b) — the SET-ALGEBRA sibling of the
  * HLL rollup in [[Sketches]]: theta sketches estimate not just |A∪B|
  * but |A∩B| and |A∖B|, which HLL fundamentally cannot. That is the
  * "returning users" (active this week ∩ active next week) and "churned
  * users" (active last week ∖ active this week) analytics over
  * pre-aggregated kilobyte artifacts — no raw re-scan, no exact
  * distinct-pair self-join over 100 TB of events.
  *
  * Spark 4 ships HLL SQL functions but no theta surface, so the
  * aggregation is a typed `Aggregator` over the DataSketches library
  * already on Spark's classpath (policy: custom code only where no
  * built-in exists — same precedent as NFKC). The aggregator is a real
  * two-phase agg: per-partition UpdateSketches union map-side, binary
  * partials merge reduce-side — the same mergeability contract as any
  * built-in, no driver funneling.
  *
  * Set operations on the resulting binaries run driver-side on
  * kilobyte compacts (Intersection/AnotB are pairwise metadata ops, not
  * data jobs). Error: a theta intersection's error grows as the
  * intersection shrinks relative to the operands (documented
  * DataSketches behavior) — the spec bounds observed error on the
  * fixture at 10% where |A∩B|/|A∪B| ≳ ¼.
  */
object ThetaSketches {

  private val LgK = 12

  /** Typed two-phase theta aggregation over a LONG column: map-side
    * UpdateSketch per partition, binary-union merge. (Long ids cover the
    * fixture's user/customer keys; a string variant is a hashIn away.)
    */
  class ThetaAgg extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    private def toSketch(b: Array[Byte]): CompactSketch =
      DsSketches.wrapCompactSketch(org.apache.datasketches.memory.Memory.wrap(b))
    override def reduce(buf: Array[Byte], v: java.lang.Long): Array[Byte] = {
      val u = SetOperation.builder().setLogNominalEntries(LgK).buildUnion()
      if (buf.nonEmpty) u.union(toSketch(buf))
      if (v != null) {
        val s = UpdateSketch.builder().setLogNominalEntries(LgK).build()
        s.update(v.longValue())
        u.union(s.compact())
      }
      u.getResult.toByteArrayCompressed
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val u = SetOperation.builder().setLogNominalEntries(LgK).buildUnion()
      u.union(toSketch(a)); u.union(toSketch(b))
      u.getResult.toByteArrayCompressed
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The theta aggregation as a Column (works inside any groupBy). */
  def thetaAgg(c: Column): Column = udaf(new ThetaAgg).apply(c)

  /** Pairwise sketch union as a Column — the MERGE step of an
    * incrementally-maintained distinct-count view (stored sketch ∪
    * delta sketch); either side may be NULL/empty. A UDF by necessity:
    * sketch union is JVM library work with no Catalyst expression
    * equivalent, and it runs once per TOUCHED GROUP per refresh, never
    * per row.
    */
  def unionCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.udf((x: Array[Byte], y: Array[Byte]) => {
      val xa = if (x == null) Array.emptyByteArray else x
      val ya = if (y == null) Array.emptyByteArray else y
      new ThetaAgg().merge(xa, ya)
    }).apply(a, b)

  /** The sketch's distinct estimate as a LONG Column (0 for NULL/empty
    * sketches) — exact below the sketch's nominal entry count (2^12).
    */
  def estimateCol(s: Column): Column =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0L else math.round(estimate(b))).apply(s)

  /** Per-(week, …) theta sketches of `distinctCol` over `events`. */
  def weeklySketches(events: DataFrame, distinctCol: String): DataFrame =
    events
      .groupBy(weekofyear(to_date(col("ts"))).as("week"))
      .agg(thetaAgg(col(distinctCol)).as("sketch"))

  private def wrap(b: Array[Byte]): CompactSketch =
    DsSketches.wrapCompactSketch(org.apache.datasketches.memory.Memory.wrap(b))

  def estimate(sketch: Array[Byte]): Double =
    if (sketch.isEmpty) 0.0 else wrap(sketch).getEstimate

  /** |A ∩ B| — returning users when A, B are consecutive periods. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A ∖ B| — churned users: active in A, gone in B. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty) return 0.0
    if (b.isEmpty) return estimate(a)
    val d = SetOperation.builder().buildANotB()
    d.setA(wrap(a)); d.notB(wrap(b))
    d.getResult(true).getEstimate
  }

  /** Week-over-week flows from a persisted sketch table: for each
    * consecutive week pair, estimated active/returning/churned counts —
    * the whole report runs on kilobyte binaries collected to the driver
    * (|weeks| rows), never re-reading events.
    */
  def weekOverWeekFlows(sketches: DataFrame): Seq[(Int, Int, Long, Long, Long, Long)] = {
    val wk = sketches.select(col("week"), col("sketch"))
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    wk.sliding(2).collect { case Array((w1, s1), (w2, s2)) =>
      (w1, w2,
       math.round(estimate(s1)), math.round(estimate(s2)),
       math.round(intersectEstimate(s1, s2)),
       math.round(differenceEstimate(s1, s2)))
    }.toSeq
  }
}
