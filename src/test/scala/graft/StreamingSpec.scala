package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

// top-level so Spark can build an encoder without an outer-instance scope
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
case class Imp(imp_id: Long, imp_ts: Timestamp, imp_user: Long)
case class Click(click_id: Long, click_ts: Timestamp, click_user: Long)
case class Doc(doc_id: Long, text: String)
case class QVec(qid: Long, qvec: Array[Float])

/** Structured Streaming semantics (SURVEY §2.8 / §5.2.4): session windows
  * agree with the batch gaps-and-islands formulation, watermarks drop late
  * rows, stateful dedup, and the foreachBatch upsert sink.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val eventsFixture = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
    Ev(2, ts("2024-01-01 10:10:00"), 1, 2.0),
    Ev(3, ts("2024-01-01 11:30:00"), 1, 3.0),  // > 30 min gap → new session
    Ev(4, ts("2024-01-01 10:05:00"), 2, 4.0),
    Ev(5, ts("2024-01-01 12:00:00"), 2, 5.0))

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "complete"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming session_window ≡ batch gaps-and-islands on the same rows") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(eventsFixture: _*)
    val streamed = runToMemory(Streams.sessionCounts(stream.toDF()), "sess_out")
      .select("user_id", "session_start", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
      .collect().toSeq

    // batch twin: same logic over a static DataFrame
    val batchDf = eventsFixture.toDF()
    val batch = Streams.sessionCounts(batchDf)
      .select("user_id", "session_start", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
      .collect().toSeq
    assert(streamed == batch)
    // and the session boundaries match the q30-style expectation:
    // user 1: [10:00-10:10+gap] 2 events, then [11:30] 1 event
    assert(streamed.map(r => (r.getLong(0), r.getLong(2))) ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("watermark drops events later than the delay behind max-seen ts") {
    val stream = MemoryStream[Ev](spark)
    val agg = Streams.watermarkedTumbling(stream.toDF(), delay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: establish event-time up to 12:00 → watermark 11:50
    stream.addData(Ev(1, ts("2024-01-01 10:15:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 12:00:00"), 1, 1.0))
    q.processAllAvailable()
    // batch 2: a 10:30 event is far behind the 11:50 watermark → dropped;
    // the 10-hour window [10:00,11:00) has already been finalized with 1 row
    stream.addData(Ev(3, ts("2024-01-01 10:30:00"), 1, 1.0),
                   Ev(4, ts("2024-01-01 13:00:00"), 1, 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(out.get("2024-01-01 10:00:00.0").contains(1L),
      s"late event was not dropped: $out")
  }

  test("dropDuplicatesWithinWatermark dedups replayed event_ids") {
    val stream = MemoryStream[Ev](spark)
    val dedup = Streams.dedupWithinWatermark(stream.toDF(), delay = "1 hour")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(1, ts("2024-01-01 10:00:30"), 1, 1.0),  // same id, replay
                   Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 10:02:00"), 1, 2.0))  // replay in later batch
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L), ids.toString)
  }

  test("stream-static join enriches a stream with a dimension (broadcast, no state store)") {
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[Ev](spark)
    val enriched = stream.toDF().join(broadcast(users), Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    stream.addData(
      Ev(10, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(11, ts("2024-01-01 10:01:00"), 2, 2.0),
      Ev(12, ts("2024-01-01 10:02:00"), 9, 3.0))  // no dim row -> null tier
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got == Map(10L -> "gold", 11L -> "basic", 12L -> null), got.toString)
    // static side broadcasts: per-microbatch hash join, no streaming state
    assert(q.lastProgress.stateOperators.isEmpty,
      "stream-static join must not allocate a state store")
  }

  test("stream-stream interval join attributes clicks; outer impressions emit after watermark") {
    val imps = MemoryStream[Imp](spark)
    val clicks = MemoryStream[Click](spark)
    val joined = Streams.clickAttribution(
      imps.toDF(), clicks.toDF(), joinType = "left_outer")
      .select("imp_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    // imp 1 gets a click 30 min later (inside the hour); imp 2's click is
    // 2h later (outside); imp 3 never clicks
    imps.addData(
      Imp(1, ts("2024-01-01 10:00:00"), 1),
      Imp(2, ts("2024-01-01 10:00:00"), 2),
      Imp(3, ts("2024-01-01 10:00:00"), 3))
    clicks.addData(
      Click(101, ts("2024-01-01 10:30:00"), 1),
      Click(102, ts("2024-01-01 12:00:00"), 2))
    q.processAllAvailable()
    val matched = spark.table("attr").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(matched.get(1L).contains(101L), matched.toString)
    assert(!matched.contains(3L), "outer row emitted before watermark passed: " + matched)
    // advance both watermarks far past every interval: unmatched
    // impressions 2 and 3 must now emit with null click columns
    imps.addData(Imp(99, ts("2024-01-02 00:00:00"), 99))
    clicks.addData(Click(999, ts("2024-01-02 00:00:00"), 99))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("attr").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(all(1L) == 101L, all.toString)
    assert(all(2L) == -1L, "out-of-interval click wrongly attributed: " + all)
    assert(all(3L) == -1L, "never-clicked impression missing: " + all)
  }

  test("flatMapGroupsWithState keeps running per-user stats across batches") {
    import graft.streaming.{UserEvent, UserStats}
    val stream = MemoryStream[UserEvent](spark)
    val stats = Streams.runningUserStats(stream.toDS())
    val q = stats.writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    stream.addData(UserEvent(1, ts("2024-01-01 10:00:00"), 1, 2.0),
                   UserEvent(2, ts("2024-01-01 10:01:00"), 1, 4.0),
                   UserEvent(3, ts("2024-01-01 10:02:00"), 2, 10.0))
    q.processAllAvailable()
    stream.addData(UserEvent(4, ts("2024-01-01 10:03:00"), 1, 6.0))
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val rows = spark.table("fmgws_out").as[UserStats].collect().toSeq
    // batch 1 emitted (u1: 2 events, sum 6) and (u2: 1, 10); batch 2
    // emitted the UPDATED u1 state (3 events, sum 12) — state carried over
    assert(rows.contains(UserStats(1, 2, 6.0, 4.0, closed = false)))
    assert(rows.contains(UserStats(2, 1, 10.0, 10.0, closed = false)))
    assert(rows.contains(UserStats(1, 3, 12.0, 6.0, closed = false)))
  }

  test("transformWithState (StatefulProcessor + ValueState) carries state across batches") {
    import graft.streaming.{UserEvent, UserStats}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[UserEvent](spark)
      val q = Streams.transformWithStateStats(stream.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      stream.addData(UserEvent(1, ts("2024-01-01 10:00:00"), 9, 2.0),
                     UserEvent(2, ts("2024-01-01 10:01:00"), 9, 4.0))
      q.processAllAvailable()
      stream.addData(UserEvent(3, ts("2024-01-01 10:02:00"), 9, 6.0))
      q.processAllAvailable()
      q.stop()
      import spark.implicits._
      val rows = spark.table("tws_out").as[UserStats].collect().toSeq
      assert(rows.contains(UserStats(9, 2, 6.0, 4.0, closed = false)))
      assert(rows.contains(UserStats(9, 3, 12.0, 6.0, closed = false)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch upsert sink merges micro-batches by key") {
    val dir = Files.createTempDirectory("graft_stream_sink").toString
    val snapshot = s"$dir/snapshot"
    val stream = MemoryStream[Ev](spark)
    val q = Streams.foreachBatchUpsertSink(
      stream.toDF(), snapshot, s"$dir/ckpt", Seq("event_id"))
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 20.0),  // update key 2
                   Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0))   // insert key 3
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(snapshot).orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toSeq
    assert(out == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)), out.toString)
  }

  test("snapshot-log sink: each batch is a committed version, pinned readers isolated") {
    import graft.sources.SnapshotLog
    val dir = Files.createTempDirectory("graft_stream_snaplog").toString
    val root = s"$dir/table"
    val stream = MemoryStream[Ev](spark)
    val q = Streams.foreachBatchSnapshotLogSink(
      stream.toDF(), root, s"$dir/ckpt", Seq("event_id"))
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0))
    q.processAllAvailable()
    // pin a reader at the first committed version...
    val pinned = SnapshotLog.read(spark, root)
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 20.0),
                   Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0))
    q.processAllAvailable()
    q.stop()
    def vals(df: org.apache.spark.sql.DataFrame) = df.orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toSeq
    // ...the pinned reader still sees only batch 0 after batch 1 lands
    assert(vals(pinned) == Seq((1L, 1.0), (2L, 2.0)), vals(pinned).toString)
    assert(vals(SnapshotLog.read(spark, root)) == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    // one version per non-empty batch, stamped with the last batch id
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    assert(SnapshotLog.lastBatchId(spark, root).contains(1L))
    // restart from the same checkpoint: nothing re-delivered, no version churn
    val q2 = Streams.foreachBatchSnapshotLogSink(
      stream.toDF(), root, s"$dir/ckpt", Seq("event_id"))
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
  }

  test("append-log sink: O(batch) delta dirs, restart appends nothing, history readable") {
    import graft.sources.SnapshotLog
    val dir = Files.createTempDirectory("graft_stream_append").toString
    val root = s"$dir/table"
    val stream = MemoryStream[Ev](spark)
    val q = Streams.foreachBatchAppendLogSink(stream.toDF(), root, s"$dir/ckpt")
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0),
                   Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).count() == 3)
    // O(batch): version 2's own delta dir holds only batch 1's rows
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 2,
      "append sink rewrote the table instead of appending a delta")
    assert(SnapshotLog.readVersion(spark, root, 1L).count() == 1)
    // restart from the checkpoint: no re-delivery, no version churn
    val q2 = Streams.foreachBatchAppendLogSink(stream.toDF(), root, s"$dir/ckpt")
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    assert(SnapshotLog.read(spark, root).count() == 3)
  }

  test("sketch sink: live per-day distinct rollup, bounded state, exactly-once") {
    import graft.sources.SnapshotLog
    import graft.engine.Sketches
    val dir = Files.createTempDirectory("graft_stream_sketch").toString
    val root = s"$dir/sketches"
    val stream = MemoryStream[Ev](spark)
    def start() = Streams.foreachBatchSketchSink(
      stream.toDF(), root, s"$dir/ckpt", "user_id")
    // day 1 in two batches with overlapping users — the union must not
    // double-count user 1 across micro-batches
    val q = start()
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 11:00:00"), 2, 1.0))
    q.processAllAvailable()
    stream.addData(Ev(3, ts("2024-01-01 12:00:00"), 1, 1.0),
                   Ev(4, ts("2024-01-02 09:00:00"), 3, 1.0))
    q.processAllAvailable(); q.stop()
    val got = SnapshotLog.read(spark, root)
      .withColumn("est", expr("hll_sketch_estimate(sketch)"))
      .select("day", "est", "n_events").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    // 150 users << 2^12 registers: HLL is effectively exact here
    assert(got == Set(("2024-01-01", 2L, 3L), ("2024-01-02", 1L, 1L)), got)
    // the persisted sketches keep full rollup algebra downstream
    assert(Sketches.estimateUnion(SnapshotLog.read(spark, root)) == 3L)
    // replay: restart with no new data — neither versions nor counts move
    val versions = SnapshotLog.versions(spark, root)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(SnapshotLog.versions(spark, root) == versions)
  }

  test("scoped-log sink: keyed upserts at O(touched partitions), exactly-once across restart") {
    import graft.sources.SnapshotLog
    val dir = Files.createTempDirectory("graft_stream_scoped").toString
    val root = s"$dir/table"
    val stream = MemoryStream[Ev](spark)
    // user_id is the (key-stable) partition column; event_id the key
    val q = Streams.foreachBatchScopedLogSink(stream.toDF(), root,
      s"$dir/ckpt", Seq("event_id"), "user_id")
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 2, 2.0))
    q.processAllAvailable()
    // batch 1 updates only user 1's partition (event 1 revised + event 3 new)
    stream.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, 10.0),
                   Ev(3, ts("2024-01-01 10:06:00"), 1, 3.0))
    q.processAllAvailable()
    q.stop()
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(vals(SnapshotLog.read(spark, root)) ==
      Seq((1L, 10.0), (2L, 2.0), (3L, 3.0)))
    // O(touched): version 2's own data dir holds ONLY user 1's partition
    val own2 = new java.io.File(root, "data_v00000002")
    assert(own2.list().filter(_.startsWith("__gp=")).toSeq == Seq("__gp=1"),
      own2.list().toSeq.toString)
    // restart from the checkpoint: replay skipped, no version churn
    val q2 = Streams.foreachBatchScopedLogSink(stream.toDF(), root,
      s"$dir/ckpt", Seq("event_id"), "user_id")
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    assert(SnapshotLog.lastBatchId(spark, root).contains(1L))
  }

  test("file stream + AvailableNow: bounded-batch backfill drains, then resumes only new files") {
    import org.apache.spark.sql.types.StructType
    val dir = Files.createTempDirectory("graft_filestream").toString
    val in = s"$dir/in"
    val schema = StructType.fromDDL("doc_id LONG, text STRING")
    // 3 single-file generations in the source dir
    for (i <- 1 to 3)
      Seq(Doc(i.toLong, s"gen $i payload")).toDF()
        .coalesce(1).write.mode("append").parquet(in)
    var batches = Vector.empty[Long]
    def drain(): Unit = Streams.drainAvailableNow(
      Streams.fileStreamSource(spark, in, schema, maxFilesPerTrigger = 1),
      s"$dir/ckpt") { (b, _) => batches = batches :+ b.count() }
    drain()
    // maxFilesPerTrigger=1 → one bounded batch per file; backlog drained
    assert(batches.count(_ > 0) == 3, batches.toString)
    assert(batches.forall(_ <= 1), s"admission limit exceeded: $batches")
    // a second drain with the same checkpoint re-reads NOTHING...
    batches = Vector.empty
    drain()
    assert(batches.forall(_ == 0), s"restart re-read old files: $batches")
    // ...and picks up only files that arrived since
    Seq(Doc(4L, "gen 4 payload")).toDF().coalesce(1).write.mode("append").parquet(in)
    batches = Vector.empty
    drain()
    assert(batches.sum == 1, s"new file not picked up exactly once: $batches")
  }

  test("foreachBatch near-dup ingest: in-batch + cross-batch dedup, short docs, replay idempotent") {
    val dir = Files.createTempDirectory("graft_neardup_sink").toString
    val snap = s"$dir/snap"
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different words entirely unrelated to anything else here now indeed"
    val textC = "a third topic about mountains rivers and weather patterns in the north"
    val stream = MemoryStream[Doc](spark)
    val q = Streams.foreachBatchNearDupSink(stream.toDF(), snap, s"$dir/ckpt",
      n = 3, k = 32, bands = 8, threshold = 0.7)
    // batch 1: 2 is an in-batch dup of 1 (identical text) → min-id 1 kept;
    // 4 is shorter than the shingle width → null signature, accepted
    stream.addData(Doc(1L, textA), Doc(2L, textA), Doc(3L, textB), Doc(4L, "too short"))
    q.processAllAvailable()
    val after1 = spark.read.parquet(snap)
    assert(after1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    // signatures persisted with the snapshot; the short doc's is null
    assert(after1.columns.contains("mh_0") && after1.columns.contains("mh_31"))
    assert(after1.filter(col("doc_id") === 4L && col("mh_0").isNull).count() == 1)
    // batch 2: 5 is a cross-batch near-dup of accepted 1 → dropped; 6 is
    // new; 7 is short (null signatures never match anything); 1 replays an
    // accepted id → dropped by the id anti-join
    stream.addData(Doc(5L, textA), Doc(6L, textC), Doc(7L, "wee"), Doc(1L, textA))
    q.processAllAvailable()
    assert(spark.read.parquet(snap).select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 6L, 7L))
    // batch 3: replay batch 2 wholesale → appends nothing (foreachBatch is
    // at-least-once; the id anti-join + near-dup gate make it idempotent)
    stream.addData(Doc(5L, textA), Doc(6L, textC), Doc(7L, "wee"), Doc(1L, textA))
    q.processAllAvailable()
    q.stop()
    val fin = spark.read.parquet(snap)
    assert(fin.count() == 5, s"replayed batch appended rows: ${fin.count()}")
    assert(fin.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 6L, 7L))
  }

  test("near-dup ingest: an empty micro-batch does not poison the snapshot read") {
    val dir = Files.createTempDirectory("graft_neardup_empty").toString
    val snap = s"$dir/snap"
    // empty first batch can leave a snapshot dir with zero data files
    // (AQE empty output) — the next batch must still read it (explicit
    // schema, not inference) and land its rows
    Streams.nearDupIngestBatch(spark.emptyDataset[Doc].toDF(), snap,
      n = 3, k = 32, bands = 8, threshold = 0.7)
    Streams.nearDupIngestBatch(
      Seq(Doc(1L, "one two three four five six seven")).toDF(), snap,
      n = 3, k = 32, bands = 8, threshold = 0.7)
    assert(spark.read.parquet(snap).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("agg-maintenance view: incremental == batch recompute; replay never double-counts") {
    val dir = Files.createTempDirectory("graft_aggmaint").toString
    val view = s"$dir/view"
    val b1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 1, 2.0),
                 Ev(2, ts("2024-01-01 10:01:00"), 1, 3.0),
                 Ev(3, ts("2024-01-01 10:02:00"), 2, 5.0))
    val b2 = Seq(Ev(4, ts("2024-01-01 10:03:00"), 1, 7.0),
                 Ev(5, ts("2024-01-01 10:04:00"), 3, 11.0))
    val stream = MemoryStream[Ev](spark)
    val q = Streams.foreachBatchAggMaintSink(stream.toDF(), view, s"$dir/ckpt",
      Seq("user_id"), "value")
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def viewRows() = Streams.readAggView(spark, view, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the maintained view equals a from-scratch batch recompute
    val expected = (b1 ++ b2).toDF()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viewRows() == expected, s"view=${viewRows()} expected=$expected")
    // at-least-once replay of batch 0: the partial is OVERWRITTEN in
    // place, not added again — additive maintenance stays idempotent
    Streams.aggMaintBatch(b1.toDF(), view, Seq("user_id"), "value", batchId = 0L)
    assert(viewRows() == expected, "replay double-counted")
    // offline compaction folds COMMITTED partials into the batch=-1 base
    // but carries the highest id unchanged — that batch may still replay
    // under at-least-once delivery, and its replay must remain an
    // in-place overwrite, never a second copy of folded data
    Streams.compactAggView(spark, view, Seq("user_id"))
    val dirs = new java.io.File(view).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=-1", "batch=1"), dirs.toString)
    assert(viewRows() == expected, "compaction changed the view")
    // replay of the carried batch after compaction: still idempotent
    Streams.aggMaintBatch(b2.toDF(), view, Seq("user_id"), "value", batchId = 1L)
    assert(viewRows() == expected, "replay AFTER compaction double-counted")
    Streams.aggMaintBatch(
      Seq(Ev(6, ts("2024-01-01 10:05:00"), 2, 13.0)).toDF(), view,
      Seq("user_id"), "value", batchId = 2L)
    assert(viewRows() == expected.map {
      case (2L, n, sv) => (2L, n + 1, sv + 13.0)
      case other       => other
    }, "post-compaction batch not folded in")
    // split-brain guard: a leftover backup alongside a live view dir must
    // stop compaction instead of silently deleting the backup's history
    new java.io.File(view + "_bak").mkdirs()
    val e = intercept[IllegalArgumentException] {
      Streams.compactAggView(spark, view, Seq("user_id"))
    }
    assert(e.getMessage.contains("crashed mid-swap"), e.getMessage)
  }

  test("foreachBatch decontamination: hygiene-at-ingest drops eval-leaking docs per micro-batch") {
    // the practical streaming-hygiene path: batch decontaminate inside
    // foreachBatch against a STATIC eval set — no streaming-join state,
    // effectively-once by the append-only sink + checkpoint
    val dir = Files.createTempDirectory("graft_stream_decon").toString
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val evalSet = Seq((100L, s"held out $span fin")).toDF("doc_id", "text")
    val stream = MemoryStream[Doc](spark)
    val q = stream.toDF().writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.engine.Training.decontaminate(batch, evalSet)
          .write.mode("append").parquet(s"$dir/clean")
      }
      .start()
    stream.addData(Doc(1L, s"leaky doc with $span inside"),
                   Doc(2L, "clean doc one with enough words to matter"))
    q.processAllAvailable()
    stream.addData(Doc(3L, s"another $span leak"),
                   Doc(4L, "clean doc two with enough words to matter"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$dir/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), kept.toString)
  }

  test("streaming batch kNN: foreachBatch + knnAll, refresh-per-batch heals churn (r17)") {
    import graft.engine.AnnIndex
    import graft.sources.SnapshotLog
    val dir = Files.createTempDirectory("graft_stream_knn").toString
    val corpus = s"$dir/emb"
    // the AnnIndexSpec fixture shape: deterministic unit vectors
    // clustered around four axes
    def vecs(n: Int, offset: Int = 0) = {
      val dim = 16
      (0 until n).map { i =>
        val id = (i + offset).toLong
        val axis = (id % 4).toInt
        val v = Array.tabulate(dim) { d =>
          val base = if (d == axis) 1.0f else 0.0f
          base + 0.05f * (((id * 131 + d * 31) % 97).toFloat / 97f)
        }
        val n0 = math.sqrt(v.map(x => x * x).sum).toFloat
        (id, v.map(_ / n0))
      }.toDF("vec_id", "embedding")
    }
    def qv(id: Int): Array[Float] = vecs(1, offset = id)
      .select("embedding").head().getSeq[Float](0).toArray
    SnapshotLog.commit(spark, corpus, vecs(200), statsCols = Seq("vec_id"))
    AnnIndex.build(spark, corpus, k = 4)
    // the "score each micro-batch against the corpus" composition: a
    // stream of query vectors, each batch answered in ONE knnAll pass;
    // REFRESH-PER-BATCH brings the index to the table head first, so
    // corpus churn between batches never trips the staleness refusal
    // and fresh vectors are immediately searchable
    val outDir = s"$dir/scored"
    val stream = MemoryStream[QVec](spark)
    val q = stream.toDF().writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.refresh(spark, corpus)
        AnnIndex.knnAll(spark, corpus, df, k = 3, nprobe = 2)
          .write.mode("append").parquet(outDir)
      }.start()
    stream.addData(QVec(101L, qv(3)), QVec(102L, qv(77)))
    q.processAllAvailable()
    // batch parity: each streamed answer equals per-query knn
    val got1 = spark.read.parquet(outDir)
      .collect().groupBy(_.getLong(0))
      .map { case (k2, rs) => k2 -> rs.map(r =>
        (r.getLong(1), r.getDouble(2))).toSeq.sortBy(-_._2) }
    assert(got1.keySet == Set(101L, 102L))
    for ((qid, src) <- Seq((101L, 3), (102L, 77))) {
      val single = AnnIndex.knn(spark, corpus, qv(src).toSeq, k = 3,
        nprobe = 2).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got1(qid) == single, s"qid $qid: ${got1(qid)} != $single")
    }
    // corpus churn between batches: the refresh-per-batch loop makes
    // the appended vector immediately searchable — its own top hit
    SnapshotLog.appendCommit(spark, corpus, vecs(20, offset = 400))
    stream.addData(QVec(103L, qv(405)))
    q.processAllAvailable()
    q.stop()
    val got2 = spark.read.parquet(outDir)
      .filter(col("qid") === 103L)
      .orderBy(desc("score")).collect()
    // ids congruent mod 97 with the same axis share the fixture's noise
    // pattern exactly (405 ≡ 17), so assert 405 is AMONG the max-score
    // hits rather than the unique top (ties break by lower id)
    assert(got2.nonEmpty, "qid 103 unanswered")
    val top = got2.head.getDouble(2)
    assert(got2.exists(r => r.getLong(1) == 405L && r.getDouble(2) == top),
      got2.map(_.toString).mkString(","))
    // the OTHER composition posture, documented by refusal: a sink
    // that skips the refresh fails its batch LOUDLY on churn (knnAll's
    // staleness gate) instead of silently answering from a stale index
    // — stream progress never outruns index freshness unnoticed
    SnapshotLog.appendCommit(spark, corpus, vecs(5, offset = 900))
    val stale = MemoryStream[QVec](spark)
    val q2 = stale.toDF().writeStream
      .option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.knnAll(spark, corpus, df, k = 3).collect(); ()
      }.start()
    stale.addData(QVec(104L, qv(3)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    def rootMsgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ rootMsgs(t.getCause)
    assert(rootMsgs(e).exists(_.contains("refresh")), rootMsgs(e).toString)
  }
}
