package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Upsert

/** Structured Streaming surface (SURVEY.md §2.8): the event-time operators
  * from the batch side (Temporal.scala) run unchanged on unbounded input —
  * these builders take ANY DataFrame (batch or streaming) so tests can
  * assert batch ≡ streaming on the same rows. Stateful pieces
  * (watermarking, streaming dedup, foreachBatch upsert sink) are
  * streaming-only.
  *
  * 100 TB notes: state stores shard by the grouping key across executors;
  * watermarks bound state size (without one, session/dedup state grows
  * unboundedly). foreachBatch + key-based upsert gives effectively-once
  * sink semantics when the target merge is idempotent, which Upsert.upsert
  * is (last-writer-wins by key).
  */
case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
                     max_value: Double, closed: Boolean)

object Streams {

  /** 1-hour tumbling counts — identical logic to Temporal.q28. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_events"), col("sum_value"))

  /** Native session windows (30-min gap) — the streaming twin of the batch
    * gaps-and-islands q30; StreamingSpec asserts they agree on the same
    * data.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("sum_value"))

  /** Watermarked tumbling aggregation: in append mode, events later than
    * `delay` behind the max seen ts are dropped and windows finalize once
    * the watermark passes them.
    */
  def watermarkedTumbling(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Stream-stream join with event-time interval bounds — the attribution
    * shape: each click joins impressions of the same user within the hour
    * BEFORE it. Both sides carry watermarks, and the interval condition
    * gives Spark an upper bound on how long either side's rows must wait in
    * the state store — without it, stream-stream state grows forever. With
    * `joinType=left_outer` on the impression side, unmatched impressions
    * emit (with null click columns) only after the watermark passes their
    * interval — correctness over latency, the Structured Streaming rule.
    *
    * 100 TB notes: state shards by the equi-key (user), so attribution
    * state per executor is (users on its shards) × (rows inside the
    * interval+delay horizon) — bounded and independent of stream length.
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       delay: String = "10 minutes",
                       joinType: String = "inner"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", delay)
    val clk = clicks.withWatermark("click_ts", delay)
    imp.join(clk,
      expr(
        """imp_user = click_user AND
          |click_ts >= imp_ts AND
          |click_ts <= imp_ts + INTERVAL 1 HOUR""".stripMargin),
      joinType)
  }

  /** Stateful streaming dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom arbitrary-state operator (flatMapGroupsWithState): per-user
    * running statistics that emit an updated row per input batch and expire
    * idle users via a processing-time timeout — the escape hatch for state
    * machines that session_window/agg can't express. State shards by the
    * group key across executors exactly like any keyed state store.
    */
  def runningUserStats(events: org.apache.spark.sql.Dataset[UserEvent],
                       idleTimeout: Option[String] = None)
      : org.apache.spark.sql.Dataset[UserStats] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            // idle user: emit a closing row and drop the state
            val last = state.get
            state.remove()
            Iterator(last.copy(closed = true))
          } else {
            val prev = state.getOption.getOrElse(
              UserStats(userId, 0L, 0.0, Double.NegativeInfinity, closed = false))
            // single O(1)-memory pass over the iterator — a hot key can
            // contribute millions of rows per micro-batch
            val next = batch.foldLeft(prev) { (s, e) =>
              s.copy(n_events = s.n_events + 1,
                     sum_value = s.sum_value + e.value,
                     max_value = math.max(s.max_value, e.value))
            }
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(next)
          }
      }
  }

  /** The modern arbitrary-state API (Spark 4 transformWithState): a
    * StatefulProcessor with typed ValueState, per-user running count/sum.
    * Functionally overlaps runningUserStats — kept as the forward-looking
    * surface (TWS supports multiple typed state variables, timers, TTL and
    * requires the RocksDB state store, which the session must enable via
    * spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider).
    */
  def transformWithStateStats(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserStats] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessorHandle, ValueState}
    import org.apache.spark.sql.Encoders

    class StatsProcessor extends StatefulProcessor[Long, UserEvent, UserStats] {
      @transient private var state: ValueState[UserStats] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[UserStats](
          "stats", Encoders.product[UserStats], org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                   timerValues: TimerValues): Iterator[UserStats] = {
        val prev = Option(state.get())
          .getOrElse(UserStats(key, 0L, 0.0, Double.NegativeInfinity, closed = false))
        val next = rows.foldLeft(prev) { (s, e) =>
          s.copy(n_events = s.n_events + 1,
                 sum_value = s.sum_value + e.value,
                 max_value = math.max(s.max_value, e.value))
        }
        state.update(next)
        Iterator(next)
      }
    }

    events
      .groupByKey(_.user_id)
      .transformWithState(new StatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Near-duplicate-aware ingest sink: every micro-batch of (doc_id, text)
    * is deduplicated against BOTH itself and everything already accepted
    * before it lands — the streaming twin of the batch MinHash-LSH
    * near-dup pipeline, composed with foreachBatch exactly like the
    * decontamination demo (hygiene-at-ingest).
    *
    * Per batch: (1) MinHash signatures for the batch docs; (2) in-batch
    * LSH candidate pairs → drop the higher id of each near-dup pair;
    * (3) cross candidates against the accepted snapshot via the band-key
    * equi-join (`MinHashLsh.crossPairsAboveThreshold`) → drop batch docs
    * estimated ≥ threshold against ANY accepted doc; (4) append survivors
    * WITH their signature columns. Persisting signatures is what keeps the
    * per-batch cost O(batch) + a bucketed join: the history is never
    * re-shingled, and at 100 TB the band-key join shuffles only colliding
    * buckets. Docs shorter than the shingle size have no signature and are
    * accepted as unique (same contract as MinHashLsh.shingles); exact
    * doc_id replays are dropped by an anti-join on the accepted ids.
    */
  def foreachBatchNearDupSink(docs: DataFrame, snapshotDir: String,
                              checkpointDir: String, n: Int = 3, k: Int = 32,
                              bands: Int = 8, threshold: Double = 0.7) = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        nearDupIngestBatch(batch, snapshotDir, n, k, bands, threshold)
      }
      .start()
  }

  /** One micro-batch of the near-dup ingest: public so specs (and batch
    * backfills) can drive it directly without a streaming query around it.
    * Idempotent under replay — re-running the same batch appends nothing.
    */
  def nearDupIngestBatch(batch: DataFrame, snapshotDir: String, n: Int,
                         k: Int, bands: Int, threshold: Double): Unit = {
    import graft.engine.MinHashLsh
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(snapshotDir), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(snapshotDir)
    val sigCols = (0 until k).map(i => s"mh_$i")
    val b0 = batch.dropDuplicates("doc_id")
    // sigs feeds banding, two estimate joins, and the batch left-join —
    // pin it once per micro-batch (lazy localCheckpoint, house style per
    // MinHashLsh.nearDuplicates) instead of re-running the shingle
    // explode + k-way min-agg per consumer on the ingest hot path.
    // FAULT-TOLERANCE TRADE-OFF: localCheckpoint truncates lineage and
    // keeps blocks on executors only — losing an executor mid-batch
    // (preemption, dynamic allocation) makes the pinned frame
    // unrecomputable and ABORTS the micro-batch. That is safe here
    // because the gate is replay-idempotent (the restarted batch
    // re-runs from the source and appends nothing twice — proven in
    // StreamingSpec's batch-split oracle), but on a long-running
    // cluster with churn expect batch retries; if retry cost dominates,
    // swap to persist(MEMORY_AND_DISK_2) (replicated, recomputable-free)
    // at 2× the memory/IO.
    val sigs = MinHashLsh.signatures(MinHashLsh.shingles(b0, n), k)
      .localCheckpoint(eager = false)
    // in-batch near-dups: keep the smallest id of each candidate pair
    val inBatchDup = MinHashLsh
      .estimateJaccard(MinHashLsh.candidatePairs(sigs, bands, k / bands), sigs, k)
      .filter(col("jaccard_est") >= threshold)
      .select(col("id_b").as("doc_id")).distinct()
    // referenced by the cross-dup probe AND two anti-joins — same pinning
    val selfClean = b0
      .join(sigs, Seq("doc_id"), "left")
      .join(inBatchDup, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    val accepted =
      if (fs.exists(dst)) {
        // explicit schema: an earlier empty micro-batch can leave the
        // snapshot directory with zero data files (just _SUCCESS), where
        // schema inference would fail; the snapshot schema is by
        // construction the schema this very function appends
        val snap = spark.read.schema(selfClean.schema).parquet(snapshotDir)
        val oldSigs = snap
          .select("doc_id", sigCols: _*)
          .filter(col("mh_0").isNotNull)
        val crossDup = MinHashLsh
          .crossPairsAboveThreshold(
            selfClean.filter(col("mh_0").isNotNull).select("doc_id", sigCols: _*),
            oldSigs, k, bands, threshold)
          .select(col("id_a").as("doc_id")).distinct()
        selfClean
          .join(crossDup, Seq("doc_id"), "left_anti")
          .join(snap.select("doc_id"), Seq("doc_id"), "left_anti") // id replays
      } else selfClean
    // the append reads the snapshot it writes to — pin the (batch-
    // sized, bounded by the micro-batch) result before writing so the
    // write job does not re-list the path it is appending into
    accepted.localCheckpoint()
      .write.mode("append").parquet(snapshotDir)
    ()
  }

  /** File-based streaming source with bounded batches: watch a parquet
    * directory, admitting at most `maxFilesPerTrigger` files per
    * micro-batch. With `Trigger.AvailableNow` this is the production
    * BACKFILL pattern: drain everything currently in the directory in
    * bounded increments (each micro-batch's state/memory is capped by the
    * admission limit, unlike a single giant batch), commit progress to the
    * checkpoint after every batch, then STOP — a crash resumes from the
    * last admitted file, and the next scheduled run picks up only new
    * files. At 100 TB this is how a table is first ingested without ever
    * holding more than maxFilesPerTrigger files' worth of work in flight.
    * An explicit schema is required — a streaming source must not pay a
    * full inference pass (SURVEY §2.2 ingestion rule).
    */
  def fileStreamSource(spark: SparkSession, dir: String,
                       schema: org.apache.spark.sql.types.StructType,
                       maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Drain a file-stream into a batch-processing function with
    * AvailableNow semantics; returns once the backlog is consumed.
    */
  def drainAvailableNow(src: DataFrame, checkpointDir: String)
                       (perBatch: (DataFrame, Long) => Unit) = {
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(perBatch)
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming MATERIALIZED VIEW maintenance: keep `groupBy(keys).agg(
    * count, sum(valueCol))` current over an unbounded stream without ever
    * reprocessing history. Each micro-batch writes its PARTIAL aggregate
    * (count/sum are mergeable states) to a batch-id-keyed subdirectory
    * with overwrite — so an at-least-once REPLAY of a batch rewrites the
    * same partial instead of double-counting, which is what makes
    * additive maintenance idempotent (an upsert-style last-writer-wins
    * merge cannot express "add these counts"; a naive additive merge
    * into one snapshot would double-apply replays). Reading the view
    * ([[readAggView]]) folds the partials — each is group-cardinality
    * sized, so the fold is O(batches × groups), and a periodic offline
    * compaction (rewrite all partials as one base partial) bounds the
    * file count exactly like any log-structured table.
    */
  def foreachBatchAggMaintSink(events: DataFrame, viewDir: String,
                               checkpointDir: String, keys: Seq[String],
                               valueCol: String) =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        aggMaintBatch(batch, viewDir, keys, valueCol, batchId)
      }
      .start()

  /** One maintenance step: overwrite this batch's partial aggregate. */
  def aggMaintBatch(batch: DataFrame, viewDir: String, keys: Seq[String],
                    valueCol: String, batchId: Long): Unit = {
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           sum(col(valueCol).cast("double")).as("sum_value"))
      .write.mode("overwrite").parquet(s"$viewDir/batch=$batchId")
    ()
  }

  /** The view's current state: fold all batch partials by key. */
  def readAggView(spark: SparkSession, viewDir: String,
                  keys: Seq[String]): DataFrame =
    spark.read.option("basePath", viewDir).parquet(viewDir)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
           sum(col("sum_value")).as("sum_value"))

  /** Offline compaction for the agg view: fold the partials into ONE base
    * partial at `batch=-1` — an id no stream ever produces, so a replayed
    * micro-batch (always a nonnegative id) can never overwrite the base.
    *
    * The HIGHEST nonnegative batch id is EXCLUDED from the fold and
    * carried over unchanged: under at-least-once delivery the stream may
    * have crashed after writing that partial but before committing the
    * offset, in which case the restarted stream REPLAYS it — replay must
    * land as an overwrite of the still-standing partial, not as a second
    * copy of data already folded into the base (which would double-count
    * permanently). Every lower id is provably committed (Structured
    * Streaming commits batches in order), so folding them is safe.
    *
    * Same single-writer contract as the other maintenance ops: run while
    * the stream is stopped. Crash-safe via backup-then-rename; if a
    * previous compaction died mid-swap AND the stream recreated the view
    * dir since, BOTH the dir and the backup exist — that needs a human
    * (the backup holds history the new dir lacks), so fail loudly instead
    * of letting the post-swap backup delete destroy it.
    */
  def compactAggView(spark: SparkSession, viewDir: String,
                     keys: Seq[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(viewDir), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(viewDir)
    val tmp = new org.apache.hadoop.fs.Path(viewDir + "_tmp")
    val bak = new org.apache.hadoop.fs.Path(viewDir + "_bak")
    // crash recovery: died between the two renames → only the backup holds
    // the view; restore it. Both present → unmergeable split-brain: stop.
    if (!fs.exists(dst) && fs.exists(bak))
      require(fs.rename(bak, dst), s"recovery rename $bak -> $dst failed")
    require(!(fs.exists(dst) && fs.exists(bak)),
      s"$bak exists alongside $dst — a previous compaction crashed mid-swap " +
      "and the view dir was recreated since; the backup holds history the " +
      "new dir lacks. Merge or restore it manually before compacting.")
    val all = spark.read.option("basePath", viewDir).parquet(viewDir)
    // partition discovery types small ids as INT — normalize to long
    val ids = all.select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0))
    val maxId = ids.filter(_ >= 0).sorted.lastOption
    val foldIds = ids.filter(id => !maxId.contains(id))
    if (foldIds.isEmpty) return // nothing committed to fold
    // pin both outputs BEFORE touching any directory
    val folded = all.filter(col("batch").isin(foldIds: _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_value")).as("sum_value"))
      .localCheckpoint()
    val carried = maxId.map(id =>
      all.filter(col("batch") === id).drop("batch").localCheckpoint())
    fs.delete(tmp, true)
    folded.write.mode("overwrite").parquet(s"$tmp/batch=-1")
    for (id <- maxId; df <- carried)
      df.write.mode("overwrite").parquet(s"$tmp/batch=$id")
    def mustRename(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(a, b), s"rename $a -> $b failed")
    mustRename(dst, bak)
    mustRename(tmp, dst)
    fs.delete(bak, true)
  }

  /** Exactly-once-style sink: each micro-batch merges into a parquet
    * snapshot by key via the engine's upsert (idempotent — replaying a
    * batch yields the same snapshot). Returns the started query.
    */
  def foreachBatchUpsertSink(events: DataFrame, snapshotDir: String,
                             checkpointDir: String, keys: Seq[String]) = {
    val spark = events.sparkSession
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Hadoop FS throughout (not java.io.File) so the sink behaves the
        // same on HDFS/S3 as on local disk.
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(snapshotDir), spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(snapshotDir)
        val bak0 = new org.apache.hadoop.fs.Path(snapshotDir + "_bak")
        // crash recovery: a previous batch may have died between the two
        // renames below, leaving only the backup — restore it first. The
        // restore must not fail silently: Hadoop rename reports most
        // failures by returning false, and proceeding with dst absent
        // would merge only the current batch and then DELETE the backup —
        // the sole surviving snapshot copy.
        if (!fs.exists(dst) && fs.exists(bak0))
          require(fs.rename(bak0, dst), s"recovery rename $bak0 -> $dst failed")
        // a micro-batch can contain several rows per key (replays); the
        // full-outer upsert would fan out on them — collapse to one row per
        // key first so the snapshot keeps its one-row-per-key invariant
        val batchByKey = batch.dropDuplicates(keys)
        val merged =
          if (fs.exists(dst)) {
            val snapshot = spark.read.parquet(snapshotDir)
            Upsert.upsert(snapshot.select(batch.columns.map(col): _*), batchByKey, keys)
          } else batchByKey
        // rewrite-snapshot sink: at lakehouse scale this becomes MERGE INTO.
        // Swap via backup-then-rename so a crash never leaves NO snapshot
        // (worst case: the backup remains and the next batch re-merges —
        // safe, because the upsert is idempotent).
        val tmp = new org.apache.hadoop.fs.Path(snapshotDir + "_tmp")
        val bak = new org.apache.hadoop.fs.Path(snapshotDir + "_bak")
        merged.write.mode("overwrite").parquet(tmp.toString)
        // Hadoop rename signals most failures by returning false, not
        // throwing — fail the batch loudly so the checkpoint never commits
        // a swap that did not happen (a false rename(tmp, dst) with dst
        // still present would nest tmp INSIDE dst).
        def mustRename(from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit =
          require(fs.rename(from, to), s"rename $from -> $to failed")
        fs.delete(bak, true)
        if (fs.exists(dst)) mustRename(dst, bak)
        mustRename(tmp, dst)
        fs.delete(bak, true)
        ()
      }
      .start()
  }

  /** Transactional streaming sink: each micro-batch lands as a new table
    * VERSION through [[graft.sources.SnapshotLog]] — readers get snapshot
    * isolation while the stream runs (a resolved reader never sees a
    * half-merged batch, unlike any overwrite-in-place sink) plus time
    * travel across batch boundaries. The manifest's batchId stamp makes
    * the sink exactly-once under Structured Streaming's post-crash batch
    * replay: a re-delivered batch is detected (head batchId ≥ incoming)
    * and skipped without touching the table — stronger than
    * [[foreachBatchUpsertSink]]'s idempotent-merge recovery, which
    * re-executes the merge and re-swaps files on replay.
    */
  def foreachBatchSnapshotLogSink(events: DataFrame, tableRoot: String,
                                  checkpointDir: String, keys: Seq[String]) =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // several rows per key in one batch would fan out the full-outer
        // upsert — collapse first (same invariant as the upsert sink)
        graft.sources.SnapshotLog.commitBatch(batch.sparkSession, tableRoot,
          batch.dropDuplicates(keys), keys, id)
        ()
      }
      .start()

  /** The O(batch) streaming table sink for INSERT-ONLY streams (event /
    * log ingestion — the dominant 100 TB streaming shape):
    * [[graft.sources.SnapshotLog.appendBatch]] publishes each micro-batch
    * as one new delta dir on the version chain instead of re-merging and
    * rewriting the whole snapshot like [[foreachBatchSnapshotLogSink]]
    * must for keyed upserts. Per-batch cost is the batch itself —
    * independent of table size — while keeping exactly-once versions
    * (batchId stamp), snapshot-isolated readers, time travel, and
    * carried-forward skipping stats.
    */
  def foreachBatchAppendLogSink(events: DataFrame, tableRoot: String,
                                checkpointDir: String,
                                statsCols: Seq[String] = Nil) =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.SnapshotLog.appendBatch(batch.sparkSession, tableRoot,
          batch, id, statsCols)
        ()
      }
      .start()

  /** The O(touched partitions) streaming sink for KEYED streams — the
    * middle of the commit-cost ladder: [[foreachBatchSnapshotLogSink]]
    * re-merges the WHOLE snapshot per batch (key-stable or not),
    * [[foreachBatchAppendLogSink]] is O(batch) but insert-only; this
    * sink gives keyed upsert semantics at per-batch cost proportional to
    * the partitions the batch touches
    * ([[graft.sources.SnapshotLog.scopedBatch]]), with the same
    * batchId-stamped exactly-once replay skip, snapshot-isolated
    * readers, time travel, and carried skipping stats. Same contract as
    * every partition-scoped merge: a key's partition value must be
    * stable across batches.
    */
  def foreachBatchScopedLogSink(events: DataFrame, tableRoot: String,
                                checkpointDir: String, keys: Seq[String],
                                partitionCol: String,
                                statsCols: Seq[String] = Nil) =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.SnapshotLog.scopedBatch(batch.sparkSession, tableRoot,
          batch.dropDuplicates(keys), keys, partitionCol, id, statsCols)
        ()
      }
      .start()

  /** Streaming distinct-count rollup sink (round 7b): maintains a
    * per-day HLL sketch table from an insert-only stream — the
    * "distinct users per day, live" problem solved with BOUNDED state.
    * Exact streaming distinct needs every seen id in the state store
    * (O(users) forever, the state-retention trap); a sketch union is
    * ASSOCIATIVE, so each micro-batch folds into the persisted daily
    * sketches by `hll_union_agg` over (current ∪ batch partials) — the
    * whole table is |days| kilobyte rows, and every period report
    * unions losslessly downstream ([[graft.engine.Sketches]]).
    * Exactly-once: the merged table commits via
    * [[graft.sources.SnapshotLog.replaceBatch]] stamped with the batch
    * id, so a post-crash replay is skipped by the stamp gate (the
    * table-is-its-own-cursor pattern). HLL union itself is idempotent
    * (register-wise max), but the ridealong n_events counts are NOT —
    * without the gate a replayed batch would double them.
    */
  def foreachBatchSketchSink(events: DataFrame, tableRoot: String,
                             checkpointDir: String, distinctCol: String,
                             lgK: Int = 12) =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val parts = batch
          .groupBy(to_date(col("ts")).as("day"))
          .agg(expr(s"hll_sketch_agg($distinctCol, $lgK)").as("sketch"),
               count(lit(1)).as("n_events"))
        val merged = graft.sources.SnapshotLog.currentVersion(s, tableRoot) match {
          case None => parts
          case Some(_) =>
            graft.sources.SnapshotLog.read(s, tableRoot)
              .unionByName(parts)
              .groupBy("day")
              .agg(expr("hll_union_agg(sketch)").as("sketch"),
                   sum(col("n_events")).as("n_events"))
        }
        graft.sources.SnapshotLog.replaceBatch(s, tableRoot, merged, id)
        ()
      }
      .start()
}
