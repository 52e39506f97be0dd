package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — keep HISTORY instead of
  * overwriting: each key's row versions carry (valid_from, valid_to,
  * is_current); applying a new extract closes the current version of
  * changed keys and appends the new version. The reference tracks
  * effective/approval dates on catalog rows — this is that lifecycle as a
  * relational operator.
  *
  * Semantics per key in `batch` at `asOf`:
  *  - key absent from history            → new open version
  *  - current version differs on any tracked column → close it
  *    (valid_to = asOf, is_current = false) + append new open version
  *  - current version identical          → no-op (idempotent re-apply)
  * Keys absent from the batch are untouched (an extract is a snapshot of
  * what exists; deletions are [[Upsert.deleteByKey]]'s job).
  *
  * 100 TB notes: one shuffle per side on the key (same class as upsert);
  * history grows append-only — on a lakehouse table this is `MERGE INTO`
  * with one UPDATE branch (close) and one INSERT branch (open), rewriting
  * only matched files. Comparison uses null-safe equality per tracked
  * column, so null → value and value → null both count as changes.
  */
object Scd2 {

  /** @param history existing SCD2 table: tracked columns + keys +
    *                (valid_from, valid_to, is_current); pass an empty
    *                DataFrame with that schema to bootstrap
    * @param batch   new extract carrying exactly the tracked columns + keys.
    *                CONTRACT: at most ONE row per key — an extract is a
    *                snapshot, so duplicate keys are a malformed input that
    *                would fan a matched current row into several versions
    *                and break the one-current-version-per-key invariant.
    *                Enforced in-plan: a duplicate key raises at execution
    *                (no extra validation job; same contract as JdbcSink).
    * @param keys    natural key columns
    * @param asOf    effective timestamp of this extract
    */
  def merge(history: DataFrame, batch: DataFrame, keys: Seq[String],
            asOf: java.sql.Timestamp): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(history.columns.contains),
      s"history must carry ${meta.mkString(", ")}")
    require(keys.nonEmpty && keys.forall(batch.columns.contains),
      s"keys $keys must be columns of the batch")
    val tracked = batch.columns.toSeq
    require(history.columns.toSeq == tracked ++ meta,
      s"history columns must be batch columns + $meta: " +
        s"${history.columns.toSeq} vs ${tracked ++ meta}")

    // The presence tag doubles as the duplicate-key guard: a count window
    // over the batch keys feeds raise_error, and because __b_present is
    // consumed by every output branch the check can never be pruned away.
    // The window shuffles the batch on the same keys the join needs, so
    // the exchange is shared — no separate validation job, no extra pass.
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(k => col("__b_" + k)): _*)
    val dupMsg = concat(
      lit("Scd2.merge: batch has multiple rows for key ("),
      concat_ws(", ", keys.map(k => col("__b_" + k).cast("string")): _*),
      lit(") — an extract must carry at most one row per key"))
    val b = batch.toDF(tracked.map("__b_" + _): _*)
      .withColumn("__b_present",
        when(count(lit(1)).over(wDup) > 1, raise_error(dupMsg))
          .otherwise(lit(true)))

    // Closed versions pass through; the join below only concerns currents.
    val closedRows = history.filter(!col("is_current"))
    val h = history.filter(col("is_current")).withColumn("__h_present", lit(true))

    val joinCond: Column = keys.map(k => h(k) <=> b("__b_" + k)).reduce(_ && _)
    val nonKeys = tracked.filterNot(keys.contains)
    val changed: Column = nonKeys
      .map(c => !(h(c) <=> b("__b_" + c)))
      .foldLeft(lit(false))(_ || _)
    val matched = col("__h_present").isNotNull && col("__b_present").isNotNull
    val j = h.join(b, joinCond, "full_outer")

    // current rows survive: unchanged/unmatched as-is, changed ones closed
    val fromHistory = j.filter(col("__h_present").isNotNull)
      .select(tracked.map(h(_)) ++ Seq(
        h("valid_from"),
        when(matched && changed, lit(asOf)).otherwise(h("valid_to")).as("valid_to"),
        when(matched && changed, lit(false)).otherwise(h("is_current")).as("is_current")): _*)

    // new open versions: batch rows with no current match, or changed
    val newVersions = j.filter(col("__b_present").isNotNull &&
        (col("__h_present").isNull || changed))
      .select(tracked.map(c => b("__b_" + c).as(c)) ++ Seq(
        lit(asOf).as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current")): _*)

    closedRows.unionByName(fromHistory).unionByName(newVersions)
  }

  /** An empty history with the right schema for `batch` + `keys`. */
  def emptyHistory(batch: DataFrame): DataFrame =
    batch.limit(0)
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  /** The current snapshot view of an SCD2 table. */
  def current(history: DataFrame): DataFrame =
    history.filter(col("is_current")).drop("valid_from", "valid_to", "is_current")

  /** Point-in-time view: rows whose validity interval covers `at`. */
  def asOf(history: DataFrame, at: java.sql.Timestamp): DataFrame =
    history
      .filter(col("valid_from") <= lit(at) &&
        (col("valid_to").isNull || col("valid_to") > lit(at)))
      .drop("valid_from", "valid_to", "is_current")
}
