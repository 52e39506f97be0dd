package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views over a
  * [[SnapshotLog]] table (round 7b) — the lakehouse pattern that turns
  * "re-aggregate 100 TB nightly" into "apply yesterday's deltas".
  *
  * A view is `GROUP BY groupCols → (n_rows, sum(m) per measure)`, stored
  * as its own SnapshotLog table, so it inherits time travel, CDC, and
  * vacuum. Maintenance reads the source's change feed
  * ([[SnapshotLog.changesBetween]]) for the un-applied version range and
  * applies it as signed contributions: insert → (+1, +v), delete →
  * (−1, −v), update → both (old group gets the negative, new group the
  * positive — a group-moving update just works). Contributions aggregate
  * to ONE row per touched group before the view merge, so a refresh
  * costs O(changes) + O(view ∩ touched groups) — never O(source).
  *
  * Exactly-once without a cursor file: the view commit is
  * [[SnapshotLog.replaceBatch]] stamped with the source version it
  * incorporates, so THE VIEW IS ITS OWN CURSOR — `lastBatchId(view)` is
  * the resume point, and data + progress land in one atomic pointer
  * swap. A crash anywhere re-runs the same range; the stamp gate skips
  * the replay. (The tailChanges cursor-file pattern would double-apply
  * here: a crash between the view commit and the cursor advance
  * re-delivers a range the view already absorbed.)
  *
  * Sums are maintained in DECIMAL(38,6), not double: an additive view
  * absorbs signed deltas forever, and float error would accumulate with
  * every refresh — exact decimal keeps `view ≡ full recompute` an exact
  * equality for the table's whole lifetime (spec-proven under random
  * commit/upsert/delete/tombstone sequences). NULL measures contribute
  * 0 to the sum (and still count in n_rows), making the sum total and
  * order-independent.
  *
  * min/max are NOT self-maintainable under deletes (removing the
  * current minimum says nothing about the runner-up), so
  * [[refreshWithExtrema]] recomputes them for TOUCHED GROUPS ONLY by a
  * semi-join back to the source snapshot — O(groups-that-changed), the
  * standard affected-partition recompute, never a full re-aggregate.
  *
  * Every refresh family has a MULTI-MEASURE form (`refreshMulti` etc.):
  * a real dashboard view maintains several sums off one feed, and doing
  * them in one pass shares the CDC read, the contribution shuffle and
  * the view merge across all measures instead of paying per measure.
  */
object IncrementalView {

  /** View column names for a given measure column. */
  private def sumCol(c: String) = s"sum_$c"
  private def minCol(c: String) = s"min_$c"
  private def maxCol(c: String) = s"max_$c"
  private def dSumCol(c: String) = s"d_sum_$c"

  private val Dec = "decimal(38,6)"
  private def zeroDec: Column = lit(0).cast(Dec)
  private def decOf(c: Column): Column = coalesce(c.cast(Dec), zeroDec)

  /** Signed per-change contributions: up to two rows (old-group negative,
    * new-group positive) per CDC row. `keys` are the source's merge keys
    * (CDC emits them unprefixed); every other column arrives as
    * old_/new_ pairs.
    */
  private def contributions(feed: DataFrame, keys: Seq[String],
                            groupCols: Seq[String],
                            measures: Seq[String]): DataFrame = {
    def side(prefix: String)(c: String): Column =
      if (keys.contains(c)) col(c) else col(s"${prefix}_$c")
    val oldG = groupCols.map(c => side("old")(c).as(c))
    val newG = groupCols.map(c => side("new")(c).as(c))
    val negative = feed
      .filter(col("change_type").isin("delete", "update"))
      .select(oldG :+ lit(-1L).as("d_rows") :++
        measures.map(m => (-decOf(side("old")(m))).as(dSumCol(m))): _*)
    val positive = feed
      .filter(col("change_type").isin("insert", "update"))
      .select(newG :+ lit(1L).as("d_rows") :++
        measures.map(m => decOf(side("new")(m)).as(dSumCol(m))): _*)
    negative.unionAll(positive)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("d_rows")).as("d_rows"),
           measures.map(m =>
             sum(col(dSumCol(m))).cast(Dec).as(dSumCol(m))): _*)
  }

  /** Signed per-group contributions from the row-identity feed's
    * row-per-image shape (`_change_type` ∈ insert / delete /
    * update_preimage / update_postimage, full row columns inline):
    * post-images add, pre-images and deletes subtract.
    */
  private def ridContributions(feed: DataFrame, groupCols: Seq[String],
                               measures: Seq[String]): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    feed.select(groupCols.map(col) :+ sign.as("__s") :++
        measures.map(m => decOf(col(m)).as(dSumCol(m))): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__s")).as("d_rows"),
           measures.map(m =>
             sum((col("__s") * col(dSumCol(m))).cast(Dec))
               .cast(Dec).as(dSumCol(m))): _*)
  }

  /** Full aggregate of `rows` in the view schema (bootstrap + the spec's
    * recompute oracle share THIS definition).
    */
  def aggregate(rows: DataFrame, groupCols: Seq[String], measure: String): DataFrame =
    aggregateMulti(rows, groupCols, Seq(measure))

  /** Multi-measure [[aggregate]]: `n_rows` plus one exact decimal sum
    * per measure, all in one grouping pass.
    */
  def aggregateMulti(rows: DataFrame, groupCols: Seq[String],
                     measures: Seq[String]): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           measures.map(m =>
             sum(decOf(col(m))).cast(Dec).as(sumCol(m))): _*)

  /** As [[aggregate]] plus min/max of the measure (extrema views). */
  def aggregateWithExtrema(rows: DataFrame, groupCols: Seq[String],
                           measure: String): DataFrame =
    aggregateMultiWithExtrema(rows, groupCols, Seq(measure))

  /** Multi-measure [[aggregateWithExtrema]]. */
  def aggregateMultiWithExtrema(rows: DataFrame, groupCols: Seq[String],
                                measures: Seq[String]): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           measures.map(m =>
             sum(decOf(col(m))).cast(Dec).as(sumCol(m))) ++
           measures.flatMap(m => Seq(
             min(col(m)).as(minCol(m)), max(col(m)).as(maxCol(m)))): _*)

  /** Bring the additive view at `viewRoot` up to date with the source at
    * `sourceRoot`. Returns the (fromV, toV] range applied, or None when
    * already current (including replay after a crash). O(changes) on the
    * source + a keyed merge on the view — never a source re-aggregate
    * after bootstrap. `consumer` (optional) registers/advances a vacuum
    * pin on the source at the version the next refresh diffs from.
    */
  def refresh(spark: SparkSession, sourceRoot: String, viewRoot: String,
              keys: Seq[String], groupCols: Seq[String], measure: String,
              consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, Some(keys), groupCols,
      Seq(measure), extrema = false, consumer)

  /** Multi-measure [[refresh]]: all sums maintained in ONE pass over
    * the feed and one view merge.
    */
  def refreshMulti(spark: SparkSession, sourceRoot: String, viewRoot: String,
                   keys: Seq[String], groupCols: Seq[String],
                   measures: Seq[String],
                   consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, Some(keys), groupCols,
      measures, extrema = false, consumer)

  /** As [[refresh]], also maintaining min/max of the measure by
    * recomputing them for the touched groups only (semi-join back to the
    * source snapshot — O(changed groups), not O(source)).
    */
  def refreshWithExtrema(spark: SparkSession, sourceRoot: String,
                         viewRoot: String, keys: Seq[String],
                         groupCols: Seq[String], measure: String,
                         consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, Some(keys), groupCols,
      Seq(measure), extrema = true, consumer)

  /** Multi-measure [[refreshWithExtrema]]. */
  def refreshMultiWithExtrema(spark: SparkSession, sourceRoot: String,
                              viewRoot: String, keys: Seq[String],
                              groupCols: Seq[String], measures: Seq[String],
                              consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, Some(keys), groupCols,
      measures, extrema = true, consumer)

  /** KEYLESS twin of [[refresh]] for row-tracked sources: the delta
    * feed is [[SnapshotLog.changesByRowId]] — the exact change set
    * derived from row identities alone, no declared key set needed.
    * This is the incremental-view shape for append-mostly FACT tables,
    * which usually have no natural merge key: enable row tracking once,
    * and the view maintains at O(changed files) on the source
    * (identity CDC is file-granular), never O(source).
    */
  def refreshByRowId(spark: SparkSession, sourceRoot: String,
                     viewRoot: String, groupCols: Seq[String],
                     measure: String,
                     consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, None, groupCols,
      Seq(measure), extrema = false, consumer)

  /** Multi-measure [[refreshByRowId]]. */
  def refreshByRowIdMulti(spark: SparkSession, sourceRoot: String,
                          viewRoot: String, groupCols: Seq[String],
                          measures: Seq[String],
                          consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, None, groupCols,
      measures, extrema = false, consumer)

  /** As [[refreshByRowId]] plus min/max maintained by the touched-group
    * recompute (the [[refreshWithExtrema]] machinery).
    */
  def refreshByRowIdWithExtrema(spark: SparkSession, sourceRoot: String,
                                viewRoot: String, groupCols: Seq[String],
                                measure: String,
                                consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, None, groupCols,
      Seq(measure), extrema = true, consumer)

  /** Multi-measure [[refreshByRowIdWithExtrema]]. */
  def refreshByRowIdMultiWithExtrema(spark: SparkSession, sourceRoot: String,
                                     viewRoot: String, groupCols: Seq[String],
                                     measures: Seq[String],
                                     consumer: Option[String] = None): Option[(Long, Long)] =
    refreshImpl(spark, sourceRoot, viewRoot, None, groupCols,
      measures, extrema = true, consumer)

  /** DISTINCT-COUNT views via MERGEABLE THETA SKETCHES (round 13):
    * `GROUP BY groupCols → (n_rows, distinct_est, dc_sketch)` where
    * `distinct_est` approximates COUNT(DISTINCT distinctCol) — exact
    * below the sketch's 2¹² nominal entries, ~1.6% RSE beyond. The
    * additive-view machinery cannot maintain COUNT DISTINCT (a delta
    * row says nothing about whether its value was already present);
    * sketches make the state MERGEABLE: each refresh aggregates only
    * the APPENDED rows into per-group delta sketches and unions them
    * with the stored ones — O(delta) + one union per touched group.
    * Sketches are NOT subtractive, so the source range must be
    * append-extended ([[SnapshotLog.appendDeltaRows]]); any other
    * change refuses loudly and the repair is a bootstrap recompute
    * (drop the view table, refresh again). Same exactly-once contract
    * as [[refresh]]: the view is its own cursor.
    */
  def refreshDistinct(spark: SparkSession, sourceRoot: String,
                      viewRoot: String, groupCols: Seq[String],
                      distinctCol: String,
                      consumer: Option[String] = None): Option[(Long, Long)] = {
    import graft.engine.ThetaSketches
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // case-INSENSITIVE: Catalyst resolution is, so 'GRP' would silently
    // sketch the group column itself
    require(!groupCols.exists(_.equalsIgnoreCase(distinctCol)),
      s"distinctCol $distinctCol cannot also be a group column")
    val toV = SnapshotLog.currentVersion(spark, sourceRoot)
      .getOrElse(return None)
    val fromV = SnapshotLog.lastBatchId(spark, viewRoot).getOrElse(0L)
    if (fromV >= toV) {
      consumer.foreach(
        SnapshotLog.registerConsumer(spark, sourceRoot, _, fromV))
      return None
    }
    // column-NAMED view schema (the additive view's sum_<m> discipline):
    // a later refresh with a different distinct_col fails loudly on
    // resolution instead of silently unioning sketches of unrelated
    // columns into a meaningless estimate
    val estCol = s"distinct_est_$distinctCol"
    val skCol = s"dc_sketch_$distinctCol"
    def sketchAgg(rows: DataFrame): DataFrame = rows
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           // NULLs stay NULL into the sketch (ThetaAgg skips them) —
           // xxhash64 alone would hash NULL to its seed and phantom-add
           // one distinct value where COUNT(DISTINCT) counts none
           ThetaSketches.thetaAgg(when(col(distinctCol).isNotNull,
               xxhash64(col(distinctCol))))
             .as(skCol))
    def withEst(df: DataFrame): DataFrame = df.select(
      groupCols.map(col) :+ col("n_rows") :+
        ThetaSketches.estimateCol(col(skCol)).as(estCol) :+
        col(skCol): _*)
    val next =
      if (fromV == 0L)
        withEst(sketchAgg(SnapshotLog.readVersion(spark, sourceRoot, toV)))
      else {
        val delta = SnapshotLog.appendDeltaRows(spark, sourceRoot, fromV, toV)
          .getOrElse(throw new IllegalStateException(
            s"refreshDistinct: source range v$fromV → v$toV is not " +
            "append-extended — distinct sketches are not subtractive " +
            "under deletes/updates; recompute by dropping the view and " +
            "refreshing again"))
        val d = sketchAgg(delta)
        val view = SnapshotLog.read(spark, viewRoot)
        val cond = groupCols.map(c => view(c) <=> d(c)).reduce(_ && _)
        withEst(view.join(d, cond, "full_outer")
          .select(
            groupCols.map(c => coalesce(d(c), view(c)).as(c)) ++ Seq(
              (coalesce(view("n_rows"), lit(0L)) +
               coalesce(d("n_rows"), lit(0L))).as("n_rows"),
              ThetaSketches.unionCol(view(skCol), d(skCol))
                .as(skCol)): _*))
      }
    SnapshotLog.replaceBatch(spark, viewRoot, next, batchId = toV) match {
      case Some(_) =>
        consumer.foreach(
          SnapshotLog.registerConsumer(spark, sourceRoot, _, toV))
        Some((fromV, toV))
      case None => None
    }
  }

  private def refreshImpl(spark: SparkSession, sourceRoot: String,
                          viewRoot: String, keysOpt: Option[Seq[String]],
                          groupCols: Seq[String], measures: Seq[String],
                          extrema: Boolean,
                          consumer: Option[String] = None): Option[(Long, Long)] = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(measures.nonEmpty, "measures must be non-empty")
    // case-INSENSITIVE like Catalyst resolution and the group-col check
    // below: ['amt','AMT'] would otherwise pass and emit ambiguous
    // sum_amt/sum_AMT columns (round 14 — ADVICE r13)
    require(measures.map(_.toLowerCase).distinct.size == measures.size,
      s"duplicate measures (case-insensitive): $measures")
    measures.foreach(m => require(!groupCols.exists(_.equalsIgnoreCase(m)),
      s"measure $m cannot also be a group column"))
    val toV = SnapshotLog.currentVersion(spark, sourceRoot)
      .getOrElse(return None) // source doesn't exist yet — nothing to do
    val fromV = SnapshotLog.lastBatchId(spark, viewRoot).getOrElse(0L)
    if (fromV >= toV) {
      // current (or a replayed crash range); still advance the pin so
      // an opted-in view converges even after unpinned refreshes
      consumer.foreach(
        SnapshotLog.registerConsumer(spark, sourceRoot, _, fromV))
      return None
    }
    val sourceAtTo = SnapshotLog.readVersion(spark, sourceRoot, toV)
    val next =
      if (fromV == 0L) {
        // bootstrap: the one full aggregate of the view's lifetime
        if (extrema) aggregateMultiWithExtrema(sourceAtTo, groupCols, measures)
        else aggregateMulti(sourceAtTo, groupCols, measures)
      } else {
        val delta = keysOpt match {
          case Some(keys) => contributions(
            SnapshotLog.changesBetween(spark, sourceRoot, fromV, toV, keys),
            keys, groupCols, measures)
          case None => ridContributions(
            SnapshotLog.changesByRowId(spark, sourceRoot, fromV, toV),
            groupCols, measures)
        }
        val view = SnapshotLog.read(spark, viewRoot)
        // null-safe equi-join: a NULL group value is a real group
        val cond = groupCols.map(c => view(c) <=> delta(c)).reduce(_ && _)
        val mergedBase = view.join(delta, cond, "full_outer")
          .select(
            groupCols.map(c => coalesce(delta(c), view(c)).as(c)) ++ Seq(
              (coalesce(view("n_rows"), lit(0L)) +
               coalesce(delta("d_rows"), lit(0L))).as("n_rows")) ++
              measures.map(m =>
                (coalesce(view(sumCol(m)), zeroDec) +
                 coalesce(delta(dSumCol(m)), zeroDec))
                  .cast(Dec).as(sumCol(m))) ++
              (if (extrema) measures.flatMap(m => Seq(
                 view(minCol(m)).as(minCol(m)),
                 view(maxCol(m)).as(maxCol(m))))
               else Nil): _*)
          .filter(col("n_rows") > 0) // emptied groups leave the view
        if (!extrema) mergedBase
        else {
          // touched groups re-derive extrema from the source snapshot;
          // untouched groups keep their stored values. The recompute is
          // scoped by an inner join on the delta's group list — at scale
          // that broadcast-joins |changed groups| rows against the
          // source, and file-skipping stats prune further.
          val touched = delta.select(groupCols.map(col): _*).distinct()
          val semiCond = groupCols.map(c => sourceAtTo(c) <=> touched(c)).reduce(_ && _)
          val fresh = aggregateMultiWithExtrema(
            sourceAtTo.join(touched, semiCond, "left_semi"),
            groupCols, measures)
            .select(groupCols.map(col) ++
              measures.flatMap(m => Seq(col(minCol(m)), col(maxCol(m)))) :+
              lit(true).as("__touched"): _*)
          val cond2 = groupCols.map(c => mergedBase(c) <=> fresh(c)).reduce(_ && _)
          mergedBase.join(fresh, cond2, "left_outer")
            .select(
              groupCols.map(c => mergedBase(c).as(c)) ++ Seq(
                mergedBase("n_rows").as("n_rows")) ++
                measures.map(m => mergedBase(sumCol(m)).as(sumCol(m))) ++
                // a touched group ALWAYS takes the fresh value — which
                // may legitimately be NULL when every remaining measure
                // is NULL — so choose by recompute MEMBERSHIP (the
                // __touched flag), never by value coalescing
                measures.flatMap(m => Seq(
                  when(fresh("__touched"), fresh(minCol(m)))
                    .otherwise(mergedBase(minCol(m))).as(minCol(m)),
                  when(fresh("__touched"), fresh(maxCol(m)))
                    .otherwise(mergedBase(maxCol(m))).as(maxCol(m)))): _*)
        }
      }
    SnapshotLog.replaceBatch(spark, viewRoot, next, batchId = toV) match {
      case Some(_) =>
        // pin the source version the NEXT refresh will diff from: the
        // (fromV, head] feed needs toV's manifest, so an aggressive
        // vacuum between refreshes must not reclaim it — the same
        // grace a registered CDC tail holds (round 9). Opt-in because
        // an abandoned view would otherwise pin the source forever.
        consumer.foreach(
          SnapshotLog.registerConsumer(spark, sourceRoot, _, toV))
        Some((fromV, toV))
      case None    => None // lost a race to a concurrent refresh — fine
    }
  }
}
