package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (round 7b) — the pre-aggregation
  * pattern that makes "distinct users per <any period>" an O(sketches)
  * query instead of an O(events) re-scan: persist ONE fixed-size HLL
  * sketch per (grain, group), then answer any coarser period by lossless
  * sketch union. This is the standard daily-rollup design for 100 TB
  * event logs — the raw log is scanned once per grain, every later
  * report unions kilobyte-sized binaries.
  *
  * Built on Spark 4's Apache DataSketches HLL expressions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), which
  * are already (a) mergeable two-phase aggregates — partial sketches
  * combine map-side like any sum — and (b) UNION-LOSSLESS at equal lgK:
  * the union of daily sketches is byte-equivalent in estimate terms to
  * one sketch built over the whole period (spec asserts exact estimate
  * equality, not a tolerance). Accuracy: relative standard error for
  * lgK=12 is ~1.6%; the spec bounds observed error at 5%.
  *
  * approx_count_distinct (q-surface: agg_approx_distinct in Extras)
  * answers a ONE-SHOT estimate; the sketch column here is the
  * PERSISTENT, re-aggregable artifact — the difference between "ran a
  * query" and "built a rollup table".
  */
object Sketches {

  /** Per-(day, group) HLL sketches of `distinctCol` — the persistable
    * daily rollup. `lgK` trades size (2^lgK bytes-ish) for error
    * (~1.04/√2^lgK); 12 is the DataSketches default.
    */
  def dailySketches(events: DataFrame, distinctCol: String, lgK: Int = 12): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr(s"hll_sketch_agg($distinctCol, $lgK)").as("sketch"),
           count(lit(1)).as("n_events"))

  /** Collapse sketches to one distinct estimate over the whole frame —
    * O(|sketches|), never re-reads the raw events.
    */
  def estimateUnion(sketches: DataFrame): Long =
    sketches.agg(expr("hll_sketch_estimate(hll_union_agg(sketch))"))
      .head().getLong(0)

  /** Re-aggregate fine-grain sketches to a coarser period (e.g. daily →
    * weekly) — the rollup-of-rollups step. Result keeps the `sketch`
    * column, so it can be rolled up again.
    */
  def rollup(sketches: DataFrame, periodCol: org.apache.spark.sql.Column): DataFrame =
    sketches
      .groupBy(periodCol.as("period"))
      .agg(expr("hll_union_agg(sketch)").as("sketch"),
           sum(col("n_events")).as("n_events"))
      .withColumn("n_distinct_est", expr("hll_sketch_estimate(sketch)"))

  /** One-shot direct estimate over raw events (the thing the rollup
    * replaces; spec proves union-of-dailies equals this exactly).
    */
  def directEstimate(events: DataFrame, distinctCol: String, lgK: Int = 12): Long =
    events.agg(expr(s"hll_sketch_estimate(hll_sketch_agg($distinctCol, $lgK))"))
      .head().getLong(0)

  /** Bench twin x13: per-status approximate distinct customers via HLL —
    * the sketch-rollup path for q13's exact countDistinct. q13's Expand
    * + distinct shuffle moves (status, custkey) pairs; this moves
    * fixed-size sketch partials regardless of customer cardinality.
    */
  def x13(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").as("n_cust_est"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
}
