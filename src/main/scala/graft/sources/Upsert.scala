package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-based upsert/merge — the reference's Postgres `INSERT … ON CONFLICT
  * DO UPDATE` re-expressed relationally (SURVEY.md §2.2 sink_upsert):
  * merge batch B into snapshot A by natural key; B wins on conflict,
  * unmatched rows from either side survive.
  *
  * Implementation: full-outer join on the key + per-column coalesce
  * (batch side first). One shuffle on the key for each side; with both
  * sides bucketed by the key on disk the shuffle disappears entirely.
  *
  * 100 TB note: this is the batch-snapshot formulation (rewrites the
  * snapshot). On a real lakehouse deployment the same merge is expressed
  * as Delta/Iceberg `MERGE INTO`, which rewrites only the files containing
  * matched keys; the semantics tested here are identical.
  */
object Upsert {

  /** Merge `batch` into `snapshot` by `keys`; batch wins per row on key
    * conflict, unmatched rows from either side survive. A presence tag on
    * the batch side makes "batch row exists" explicit (correct even when
    * non-key batch columns are legitimately null). Null-safe key equality
    * so null-keyed rows merge rather than duplicate.
    */
  def upsert(snapshot: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    require(snapshot.columns.toSeq == batch.columns.toSeq,
      s"upsert requires identical schemas: ${snapshot.columns.toSeq} vs ${batch.columns.toSeq}")
    require(keys.nonEmpty && keys.forall(snapshot.columns.contains),
      s"keys $keys must be columns of the table")
    // Rename the batch side up front: chained upserts are self-joins by
    // lineage (upsert(upsert(a,b),b)) and unrenamed column refs would be
    // ambiguous to the analyzer.
    val cols = snapshot.columns.toSeq
    val a = snapshot
    val b = batch.toDF(cols.map("__b_" + _): _*).withColumn("__present", lit(true))
    val joinCond: Column = keys.map(k => a(k) <=> b("__b_" + k)).reduce(_ && _)
    val merged = a.join(b, joinCond, "full_outer")
    val useBatch = col("__present").isNotNull
    val out = cols.map(c => when(useBatch, col("__b_" + c)).otherwise(a(c)).as(c))
    merged.select(out: _*)
  }

  /** Partition-scoped upsert on a partitioned parquet layout (the
    * incremental-ingest shape every real deployment hits first): merge
    * `batch` into the table at `path`, rewriting ONLY the partitions the
    * batch touches. Untouched partitions' files are never read or
    * rewritten — at 100 TB this is the difference between rewriting one
    * day and rewriting the lake, the same file-pruning win a lakehouse
    * `MERGE INTO` gives (semantics tested identical to [[upsert]] on the
    * affected slice).
    *
    * Mechanics: the batch's distinct partition values (bounded — e.g.
    * days) are collected and prune the snapshot read; the merged result is
    * written with dynamic partition overwrite, which replaces exactly the
    * partitions present in the output. Spark (correctly) refuses plans
    * that overwrite a path they are still reading, so the merged slice is
    * STAGED: written to a sibling `<path>_graft_staging` directory first,
    * then the final overwrite streams from the staged files. Staging
    * bounds memory at normal writer buffers whatever the slice size — a
    * localCheckpoint here would instead pin the entire merged slice in
    * executor memory/disk blocks (tens of GB for one hot partition at
    * 100 TB). Cost is one extra sequential write+read of the touched
    * slice only. The staging dir is removed on completion; a deterministic
    * name means concurrent upserts to the SAME table would collide — which
    * dynamic partition overwrite already forbids (single-writer per table,
    * as with any non-transactional lake write).
    *
    * CONTRACT: a key's partition value must be stable across versions
    * (derived from the row's identity, e.g. event_date from ts). A key
    * that moves partitions would leave its old copy in the unread old
    * partition — the same caveat as any partition-pruned merge; use
    * [[upsert]] on the full snapshot when keys can migrate.
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        batch: DataFrame, keys: Seq[String],
                        partitionCol: String): Unit = {
    require(batch.columns.contains(partitionCol),
      s"batch must carry the partition column $partitionCol")
    require(!keys.contains(partitionCol) || keys.size > 1,
      "partition column alone cannot be the key")
    val touched = batch.select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return // empty batch: nothing to rewrite
    val snapshot = spark.read.parquet(path)
    // partition pruning: only the touched partitions' files are read.
    // isin(null) never matches, so a null partition value needs its own
    // isNull branch — otherwise pre-existing rows in the null partition
    // (__HIVE_DEFAULT_PARTITION__) would be silently replaced by batch
    // rows alone instead of merged.
    val (nullTouched, nonNull) = touched.partition(_ == null)
    val pruneNonNull =
      if (nonNull.nonEmpty) col(partitionCol).isin(nonNull.toSeq: _*)
      else lit(false)
    val prune =
      if (nullTouched.nonEmpty) pruneNonNull || col(partitionCol).isNull
      else pruneNonNull
    val affected = snapshot
      .filter(prune)
      .select(batch.columns.map(col): _*) // partition col reads back last — realign
    val merged = upsert(affected, batch, keys)
    // stage, then overwrite-from-staged: the final write must not read
    // `path`, and staging keeps the memory bound at writer buffers (see
    // Scaladoc). partitionCol rides as a normal data column in staging so
    // its type and null values survive the round-trip exactly.
    // normalize: trailing slashes would otherwise nest the staging dir
    // INSIDE the table directory instead of beside it
    val normalized = path.replaceAll("/+$", "")
    val staging = new org.apache.hadoop.fs.Path(normalized + "_graft_staging")
    val claim = new org.apache.hadoop.fs.Path(normalized + "_graft_staging_claim")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Writer claim: create(overwrite=false) either creates the marker or
    // throws — two concurrent upserts cannot both win where the FS gives
    // atomic create (HDFS, local). On object stores (S3A HEAD-then-PUT)
    // the guarantee is best-effort only — pair with an external lock
    // there. A surviving claim file means a CONCURRENT upsert on this
    // table (forbidden) or a hard-crashed run's leftover (safe to remove
    // by hand; nothing of a crashed run reached `path` — the staged data
    // only lands via the swap below). Only the contention exceptions map
    // to "claimed=false"; genuine IO failures (permissions, transient
    // network) propagate instead of masquerading as a concurrent writer.
    val claimed =
      try { fs.create(claim, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    require(claimed,
      s"could not claim $claim — concurrent upsertPartitioned on this " +
      "table, or a hard-crashed run's leftover (remove it and retry)")
    try {
      // the staging write sits INSIDE the try: an in-process write failure
      // (disk full, task retries exhausted) must clean up after itself, or
      // the claim above would brick every later upsert on this table
      merged.write.mode("overwrite").parquet(staging.toString)
      // per-write option — scopes dynamic overwrite to THIS write instead
      // of mutating the session conf under concurrent writers
      spark.read.parquet(staging.toString).write
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy(partitionCol).parquet(path)
    } finally {
      fs.delete(staging, true)
      fs.delete(claim, false)
    }
  }

  /** Key-wise delete — the MERGE WHEN MATCHED THEN DELETE shape (the
    * reference drops catalog rows that vanish from the next extract). A
    * left-anti join on null-safe key equality: one shuffle per side, same
    * plan class as the semi/anti declared queries; on a lakehouse table the
    * equivalent is `MERGE … WHEN MATCHED THEN DELETE` / `DELETE WHERE`.
    *
    * @param tombstones any DataFrame carrying the key columns (extra
    *                   columns are ignored)
    */
  def deleteByKey(snapshot: DataFrame, tombstones: DataFrame,
                  keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && keys.forall(snapshot.columns.contains),
      s"keys $keys must be columns of the table")
    require(keys.forall(tombstones.columns.contains),
      s"keys $keys must be columns of the tombstone set")
    val t = tombstones.select(keys.map(k => col(k).as("__t_" + k)): _*)
    val cond: Column = keys.map(k => snapshot(k) <=> t("__t_" + k)).reduce(_ && _)
    snapshot.join(t, cond, "left_anti")
  }
}
