package graft

import java.nio.file.Files

import graft.sources.SnapshotLog

/** Structured-Streaming tail of a snapshot-log table (round 8): version
  * offsets, initial-snapshot-then-appends delivery, exactly-once across
  * a kill/restart via the ordinary SS checkpoint, and the loud
  * append-only contract (rewrites / deletion vectors refuse with the
  * offending version instead of double-shipping rows).
  */
class TailStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_tail").toString + "/t"

  private def rows(table: String): Set[(Long, String, Double)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("tail: initial snapshot, live appends, exactly-once across restart") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck").toString
    val out = Files.createTempDirectory("graft_tail_out").toString
    SnapshotLog.commit(spark, root,
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "x"))
    SnapshotLog.appendCommit(spark, root, Seq((3L, "c", 3.5)).toDF("k", "v", "x"))

    // a fault-tolerant sink (file sink, _spark_metadata exactly-once) so
    // the SAME checkpoint can recover across a stop/start
    def start() = spark.readStream.format("graft").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def sunk(): Seq[(Long, String, Double)] = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"), r.getAs[Double]("x"))).toSeq

    val q1 = start()
    try {
      q1.processAllAvailable()
      // first batch = the whole snapshot at stream start (both commits)
      assert(sunk().toSet ==
        Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
      // a live append arrives incrementally, no duplicates
      SnapshotLog.appendCommit(spark, root, Seq((4L, "d", 4.5)).toDF("k", "v", "x"))
      q1.processAllAvailable()
      assert(sunk().size == 4 && sunk().toSet ==
        Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5), (4L, "d", 4.5)))
    } finally q1.stop()

    // append while the stream is DOWN; restart from the same checkpoint:
    // exactly the missed version arrives — nothing re-delivered, nothing
    // lost (5 distinct rows, 5 physical rows)
    SnapshotLog.appendCommit(spark, root, Seq((5L, "e", 5.5)).toDF("k", "v", "x"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val all = sunk()
      assert(all.size == 5, s"exactly-once violated: ${all.sorted}")
      assert(all.toSet == Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5),
        (4L, "d", 4.5), (5L, "e", 5.5)))
    } finally q2.stop()
  }

  test("tail: timestamp and null columns round-trip through the group reader") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck2").toString
    val ts1 = java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")
    SnapshotLog.commit(spark, root,
      Seq((1L, ts1, Some(10)), (2L, ts1, None))
        .toDF("k", "ts", "n"))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("tail_ts_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      val got = spark.table("tail_ts_sink").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
      assert(got == Set((1L, ts1, Some(10)), (2L, ts1, None)))
    } finally q.stop()
  }

  test("maxVersionsPerBatch slices catch-up into bounded micro-batches, losing nothing") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck7").toString
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    (2 to 4).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        Seq((i.toLong, s"r$i", i + 0.5)).toDF("k", "v", "x"))
    }
    // 4 committed versions behind; one version per trigger → the catch-up
    // runs as 4 bounded batches instead of one giant initial load
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(root)
      .writeStream.format("memory").queryName("tail_paced_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_paced_sink").count() == 4)
      assert(spark.table("tail_paced_sink").select("k").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 4,
        s"expected 4 single-version batches, saw $dataBatches " +
          q.recentProgress.map(p => p.numInputRows).mkString("[", ",", "]"))
    } finally q.stop()
  }

  test("maxBytesPerBatch budgets catch-up by delta size from the file manifest") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck8").toString
    // 4 versions of similar size; a cap of ~2 deltas' bytes must split
    // the catch-up into 2 two-version batches (never 1 four-version one)
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    (2 to 4).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        Seq((i.toLong, s"r$i", i + 0.5)).toDF("k", "v", "x"))
    }
    val perDelta = (1 to 4).map(v =>
      SnapshotLog.deltaBytesOf(spark, root, v.toLong))
    assert(perDelta.forall(_ > 0), s"manifest sizes must resolve: $perDelta")
    // admits any two consecutive deltas but never three (file sizes
    // differ by a few bytes across versions — cap at the LARGEST pair)
    val cap = perDelta.sliding(2).map(_.sum).max
    val q = spark.readStream.format("graft")
      .option("maxBytesPerBatch", cap.toString).load(root)
      .writeStream.format("memory").queryName("tail_bytes_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_bytes_sink").count() == 4)
      assert(spark.table("tail_bytes_sink").select("k").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 2,
        s"expected 2 byte-capped batches, saw $dataBatches " +
          q.recentProgress.map(p => p.numInputRows).mkString("[", ",", "]"))
    } finally q.stop()

    // an oversized single commit still ships alone: progress never stalls
    val root2 = freshRoot()
    val ck2 = Files.createTempDirectory("graft_tail_ck9").toString
    SnapshotLog.commit(spark, root2, Seq((1L, "big", 1.0)).toDF("k", "v", "x"))
    val q2 = spark.readStream.format("graft")
      .option("maxBytesPerBatch", "1").load(root2)
      .writeStream.format("memory").queryName("tail_bytes_sink2")
      .option("checkpointLocation", ck2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("tail_bytes_sink2").count() == 1)
    } finally q2.stop()
  }

  test("startingVersion begins the tail mid-history instead of the whole snapshot") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck10").toString
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    (2 to 4).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        Seq((i.toLong, s"r$i", i + 0.5)).toDF("k", "v", "x"))
    }
    val q = spark.readStream.format("graft")
      .option("startingVersion", "3").load(root)
      .writeStream.format("memory").queryName("tail_sv_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      // versions 3 and 4 only — the v1 snapshot and v2 append are skipped
      assert(spark.table("tail_sv_sink").select("k").collect()
        .map(_.getLong(0)).toSet == Set(3L, 4L))
    } finally q.stop()

    // a startingVersion beyond head+1 would silently degrade to "start
    // from now" (offsets never move backward) — refuse loudly instead
    val ck2 = Files.createTempDirectory("graft_tail_ck11").toString
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "99").load(root)
        .writeStream.format("memory").queryName("tail_sv_bad")
        .option("checkpointLocation", ck2).start()
      try q2.processAllAvailable() finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("beyond the table head")),
      s"expected a loud refusal, got: ${msgs(e)}")
  }

  test("tail survives additive schema evolution mid-stream at its start-time schema") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck5").toString
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("tail_evo_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(rows("tail_evo_sink") == Set((1L, "a", 1.5)))
      // an additive evolution commit (pinned wider schema, no files
      // rewritten — a superset-dirs append) must NOT break the tail: the
      // stream keeps its start-time schema, the new column is simply not
      // shipped (by-name decode), and post-evolution rows still arrive
      SnapshotLog.appendEvolved(spark, root,
        Seq((2L, "b", 2.5, 99)).toDF("k", "v", "x", "extra"))
      q.processAllAvailable()
      assert(rows("tail_evo_sink") == Set((1L, "a", 1.5), (2L, "b", 2.5)))
    } finally q.stop()
  }

  test("skipChangeCommits: the tail survives a compaction and a DV delete, appends keep flowing") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_skip_ck").toString
    val out = Files.createTempDirectory("graft_tail_skip_out").toString
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    def start() = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def sunk(): Seq[(Long, String)] = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq
    val q = start()
    try {
      q.processAllAvailable()
      SnapshotLog.appendCommit(spark, root, Seq((2L, "b", 2.5)).toDF("k", "v", "x"))
      q.processAllAvailable()
      assert(sunk().toSet == Set((1L, "a"), (2L, "b")))
      // maintenance mid-stream: a DV delete then a full compaction —
      // without the option both wedge the stream permanently
      SnapshotLog.tombstoneDelete(spark, root, Seq(1L).toDF("k"), Seq("k"))
      SnapshotLog.compactChain(spark, root)
      q.processAllAvailable()
      // skipped wholesale: nothing re-shipped, nothing lost
      assert(sunk().size == 2, s"change commits leaked rows: ${sunk()}")
      // and the stream is still LIVE: a post-maintenance append ships
      SnapshotLog.appendCommit(spark, root, Seq((3L, "c", 3.5)).toDF("k", "v", "x"))
      q.processAllAvailable()
      assert(sunk().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(sunk().size == 3)
    } finally q.stop()
  }

  test("ignoreDeletes: pure DV deletes skip; the initial load excludes tombstoned rows") {
    val root = freshRoot()
    // deletes BEFORE stream start: the initial snapshot must match the
    // batch read (deleted rows excluded executor-side via the vector
    // references), not the raw files
    SnapshotLog.commit(spark, root,
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("k", "v", "x"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(2L).toDF("k"), Seq("k"))
    val ck = Files.createTempDirectory("graft_tail_igd_ck").toString
    val out = Files.createTempDirectory("graft_tail_igd_out").toString
    val q = spark.readStream.format("graft")
      .option("ignoreDeletes", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    def sunk(): Seq[(Long, String)] = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq
    try {
      q.processAllAvailable()
      assert(sunk().toSet == Set((1L, "a"), (3L, "c")),
        s"initial load must exclude the deleted row: ${sunk()}")
      // a delete mid-stream skips (not replayed), appends keep flowing
      SnapshotLog.tombstoneDelete(spark, root, Seq(3L).toDF("k"), Seq("k"))
      SnapshotLog.appendCommit(spark, root, Seq((4L, "d", 4.5)).toDF("k", "v", "x"))
      q.processAllAvailable()
      assert(sunk().toSet == Set((1L, "a"), (3L, "c"), (4L, "d")))
      assert(sunk().size == 3)
      // ignoreDeletes does NOT cover rewrites: a compaction still refuses
      SnapshotLog.compactChain(spark, root)
      val ex = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(m => m.contains("skipChangeCommits")),
        s"expected the rewrite refusal naming the opt-out, got: ${messages(ex)}")
    } finally q.stop()
  }

  test("tail refuses a rewrite and a deletion vector with the offending version") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_tail_ck3").toString
    SnapshotLog.commit(spark, root, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("tail_guard_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(rows("tail_guard_sink") == Set((1L, "a", 1.5)))
      // a deletion vector lands: the next poll must fail loudly, not
      // silently keep shipping rows the table no longer has
      SnapshotLog.tombstoneDelete(spark, root, Seq(1L).toDF("k"), Seq("k"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(m =>
        m.contains("'delete' commit") || m.contains("deletion vectors")),
        s"expected the append-only refusal, got: ${messages(ex)}")
    } finally q.stop()

    // a full-snapshot rewrite (kind-less manifest) is also refused — the
    // dir-superset check catches it even without a kind marker
    val root2 = freshRoot()
    val ck2 = Files.createTempDirectory("graft_tail_ck4").toString
    SnapshotLog.commit(spark, root2, Seq((1L, "a", 1.5)).toDF("k", "v", "x"))
    val q2 = spark.readStream.format("graft").load(root2)
      .writeStream.format("memory").queryName("tail_guard_sink2")
      .option("checkpointLocation", ck2).start()
    try {
      q2.processAllAvailable()
      SnapshotLog.commit(spark, root2, Seq((9L, "z", 9.5)).toDF("k", "v", "x"))
      val ex2 = intercept[Exception] { q2.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex2).exists(_.contains("replaced directories")),
        s"expected the rewrite refusal, got: ${messages(ex2)}")
    } finally q2.stop()
  }
}
