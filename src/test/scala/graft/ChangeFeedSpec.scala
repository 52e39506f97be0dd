package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round-9 directive #3: commit-time change files. With
  * `graft.changeFeed.enabled=true`, a scoped upsert writes its row-level
  * diff (insert / update_preimage / update_postimage) into `chg_v{N}/`
  * at commit time — O(touched), riding the merge's own join — and the
  * SQL general-MERGE lowering ([[SnapshotLog.replaceWithChanges]])
  * records its multiset diff as delete + insert rows. The CDC streaming
  * source then ships those versions instead of refusing them, and
  * [[SnapshotLog.changesBetween]] folds the recorded events into the
  * net keyed diff without any full-snapshot join.
  */
class ChangeFeedSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cdf").toString + "/t"

  private def withFeed[A](body: => A): A = {
    spark.conf.set("graft.changeFeed.enabled", "true")
    try body finally spark.conf.unset("graft.changeFeed.enabled")
  }

  private val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("gp", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType)))

  test("CDC stream ships scoped upserts and general MERGE from commit-time change files") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    def feed(): Set[(Int, String, String, Long)] =
      spark.read.schema(cdcSchema).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(2), r.getString(3), r.getLong(4))).toSet
    withFeed {
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3")).toDF("k", "gp", "v"),
        Seq("k"), "gp") // v1
      val q = spark.readStream.format("graft").option("changes", "true").load(root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable()
        assert(feed().isEmpty, "CDC starts at the head")

        // scoped upsert touching ONE partition: update k=1, insert k=9,
        // leave k=2 identical (a no-op upsert is not a change)
        SnapshotLog.upsertScoped(spark, root,
          Seq((1, "a", "X1"), (2, "a", "x2"), (9, "a", "x9")).toDF("k", "gp", "v"),
          Seq("k"), "gp") // v2
        q.processAllAvailable()
        assert(feed() == Set(
          (1, "x1", "update_preimage", 2L), (1, "X1", "update_postimage", 2L),
          (9, "x9", "insert", 2L)), feed().toString)

        // general MERGE shape: full replace with a recorded multiset diff
        val next = SnapshotLog.read(spark, root)
          .withColumn("v", when($"k" === 3, lit("X3")).otherwise($"v"))
          .filter($"k" =!= 2) // and delete k=2
        SnapshotLog.replaceWithChanges(spark, root,
          next.select("k", "gp", "v")) // v3
        q.processAllAvailable()
        val v3 = feed().filter(_._4 == 3L)
        assert(v3 == Set(
          (3, "x3", "delete", 3L), (3, "X3", "insert", 3L),
          (2, "x2", "delete", 3L)), v3.toString)
      } finally q.stop()
    }
  }

  test("changesBetween uses recorded events: O(changes), no full-snapshot join in the plan") {
    val rootF = freshRoot(); val rootN = freshRoot()
    def build(root: String): Unit = {
      SnapshotLog.upsertScoped(spark, root,
        (0 until 300).map(k => (k, (k % 5).toString, s"v$k")).toDF("k", "gp", "v"),
        Seq("k"), "gp") // v1
      SnapshotLog.upsertScoped(spark, root,
        Seq((7, "2", "V7"), (999, "2", "v999")).toDF("k", "gp", "v"),
        Seq("k"), "gp") // v2: update k=7, insert k=999 (partition 2 only)
      SnapshotLog.appendCommit(spark, root,
        Seq((1000, "9", "v1000")).toDF("k", "gp", "v")) // v3: plain append
      SnapshotLog.upsertScoped(spark, root,
        Seq((7, "2", "V7b")).toDF("k", "gp", "v"), Seq("k"), "gp") // v4
    }
    withFeed { build(rootF) }
    build(rootN) // no feed: the keyed-diff fallback is the oracle
    val fast = SnapshotLog.changesBetween(spark, rootF, 1L, 4L, Seq("k"))
    val slow = SnapshotLog.changesBetween(spark, rootN, 1L, 4L, Seq("k"))
    // identical net diff: k=7 updated (v1 state → v4 state, intermediate
    // V7 invisible), k=999/k=1000 inserted
    val fr = fast.collect().map(_.toSeq).toSet
    val sr = slow.collect().map(_.toSeq).toSet
    assert(fr == sr, s"event-feed diff drifted:\n fast=$fr\n slow=$sr")
    assert(fr.exists(r => r.head == "update" && r(1) == 7))
    assert(fr.exists(r => r.head == "insert" && r(1) == 999))
    // the recorded-events plan reads change files + delta dirs and
    // aggregates — it must contain NO join at all, where the fallback
    // is a full-outer join of two whole snapshots
    val plan = fast.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected a join-free event fold, got:\n$plan")
    assert(slow.queryExecution.optimizedPlan.toString.contains("FullOuter"),
      "twin table should exercise the fallback (test wiring check)")
  }

  test("keyed upsert and deleteByKey record change files; the stream ships them") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdf_kv_ck").toString
    val out = Files.createTempDirectory("graft_cdf_kv_out").toString
    val kvSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType)))
    def feed(): Set[(Int, String, String, Long)] =
      spark.read.schema(kvSchema).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    withFeed {
      SnapshotLog.commit(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v")) // v1
      val q = spark.readStream.format("graft").option("changes", "true").load(root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable()
        // keyed upsert: update k=1, insert k=3, k=2 untouched
        SnapshotLog.upsert(spark, root,
          Seq((1, "A"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k")) // v2
        q.processAllAvailable()
        assert(feed() == Set(
          (1, "a", "update_preimage", 2L), (1, "A", "update_postimage", 2L),
          (3, "c", "insert", 2L)), feed().toString)
        // keyed delete: k=2 leaves as a delete row
        SnapshotLog.deleteByKey(spark, root, Seq(2).toDF("k"), Seq("k")) // v3
        q.processAllAvailable()
        assert(feed().filter(_._4 == 3L) == Set((2, "b", "delete", 3L)),
          feed().toString)
      } finally q.stop()
      // and changesBetween over the full keyed-rewrite lineage is the
      // recorded-event fold, not the snapshot diff
      val diff = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
      assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"))
      assert(diff.collect().map(_.toSeq).toSet == Set(
        Seq("update", 1, "a", "A"), Seq("delete", 2, "b", null),
        Seq("insert", 3, null, "c")))
    }
  }

  test("OCC scoped upserts stage their change rows; the rebased publish ships them exactly") {
    val root = freshRoot()
    withFeed {
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "x1"), (2, "b", "x2")).toDF("k", "gp", "v"),
        Seq("k"), "gp") // v1
      // two writers stage against the SAME head on disjoint partitions;
      // the second publish rebases over the first
      val s1 = SnapshotLog.stageScopedOcc(spark, root,
        Seq((1, "a", "X1")).toDF("k", "gp", "v"), Seq("k"), "gp")
      val s2 = SnapshotLog.stageScopedOcc(spark, root,
        Seq((9, "b", "x9")).toDF("k", "gp", "v"), Seq("k"), "gp")
      val v2 = SnapshotLog.publishScopedOcc(spark, root, s1)
      val v3 = SnapshotLog.publishScopedOcc(spark, root, s2)
      assert(v2 == 2L && v3 == 3L)
      // both versions carry recorded change files the batch feed folds
      val diff = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
      assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"),
        "OCC change versions must ride the recorded-event fold")
      assert(diff.collect().map(_.toSeq).toSet == Set(
        Seq("update", 1, "a", "a", "x1", "X1"),
        Seq("insert", 9, null, "b", null, "x9")))
    }
  }

  test("upsertMor records change files under the feed; the CDC stream ships a MoR table") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdf_mck").toString
    val out = Files.createTempDirectory("graft_cdf_mout").toString
    val morSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType)))
    def feed(): Set[(Int, String, String, Long)] =
      spark.read.schema(morSchema).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    withFeed {
      SnapshotLog.upsertMor(spark, root,
        Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k")) // v1
      val q = spark.readStream.format("graft").option("changes", "true")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable()
        assert(feed().isEmpty, "CDC starts at the head")
        // shadowing upsert: update k=2, insert k=3, k=2-identical would
        // ship nothing (same rule as the scoped feed)
        SnapshotLog.upsertMor(spark, root,
          Seq((2, "B2"), (3, "c")).toDF("k", "v"), Seq("k")) // v2
        q.processAllAvailable()
        assert(feed() == Set(
          (2, "b", "update_preimage", 2L), (2, "B2", "update_postimage", 2L),
          (3, "c", "insert", 2L)), feed().toString)
        // a pure no-op upsert ships nothing
        SnapshotLog.upsertMor(spark, root,
          Seq((3, "c")).toDF("k", "v"), Seq("k")) // v3
        q.processAllAvailable()
        assert(feed().forall(_._4 <= 2L), feed().toString)
      } finally q.stop()
    }
    // without the feed, the changes stream keeps the loud mor refusal
    val bare = freshRoot()
    SnapshotLog.upsertMor(spark, bare, Seq((1, "a")).toDF("k", "v"), Seq("k"))
    val q2 = spark.readStream.format("graft").option("changes", "true")
      .load(bare)
      .writeStream.format("parquet")
      .option("path", Files.createTempDirectory("graft_cdf_bo").toString)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cdf_bc").toString).start()
    try {
      q2.processAllAvailable()
      SnapshotLog.upsertMor(spark, bare, Seq((1, "A")).toDF("k", "v"), Seq("k"))
      val e = intercept[Exception] { q2.processAllAvailable() }
      assert(e.getMessage.contains("mor") ||
        Option(e.getCause).exists(_.getMessage.contains("mor")),
        s"expected the mor-kind refusal, got: ${e.getMessage}")
    } finally q2.stop()
  }

  test("mergeMor records insert + update pre/post + delete change rows; no-op merge commits nothing") {
    val root = freshRoot()
    withFeed {
      SnapshotLog.upsertMor(spark, root,
        Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k")) // v1
      SnapshotLog.mergeMor(spark, root,
        writes = Seq((1, "A"), (9, "i")).toDF("k", "v"),
        deleteKeys = Seq(Tuple1(2)).toDF("k"), keys = Seq("k")) // v2
      val chg = spark.read.parquet(root + "/chg_v00000002").collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[String]("v"),
          r.getAs[String]("_change_type"))).toSet
      assert(chg == Set(
        (1, "a", "update_preimage"), (1, "A", "update_postimage"),
        (9, "i", "insert"), (2, "b", "delete")), chg.toString)
    }
    // visible state after the one-commit merge: update + insert + delete
    assert(SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "A"), (3, "c"), (9, "i")))
    // a clause-less no-op merge publishes NO empty version
    val before = SnapshotLog.currentVersion(spark, root).get
    SnapshotLog.mergeMor(spark, root,
      writes = Seq.empty[(Int, String)].toDF("k", "v"),
      deleteKeys = Seq.empty[Tuple1[Int]].toDF("k"), keys = Seq("k"))
    assert(SnapshotLog.currentVersion(spark, root).contains(before),
      "no-op mergeMor committed an empty version")
    // a key both written and deleted in one merge is contradictory
    val both = intercept[Exception] {
      SnapshotLog.mergeMor(spark, root,
        writes = Seq((3, "z")).toDF("k", "v"),
        deleteKeys = Seq(Tuple1(3)).toDF("k"), keys = Seq("k"))
    }
    assert(both.getMessage.contains("both written and deleted"),
      both.getMessage)
  }

  test("changesBetween folds DV deletes and MoR updates positionally — no snapshot diff, no feed conf") {
    // these derive from the log itself: no graft.changeFeed.enabled
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3")).toDF("k", "gp", "v")) // v1
    SnapshotLog.appendCommit(spark, root,
      Seq((4, "b", "x4")).toDF("k", "gp", "v")) // v2
    SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k")) // v3
    SnapshotLog.updateWhere(spark, root,
      base => base("k") === 2, Map("v" -> lit("X2"))) // v4 (MoR update)
    // re-delete k=1: fully deduplicated against v3's vector — the new
    // vector is empty and the feed must NOT report a second death
    SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k")) // v5
    val diff = SnapshotLog.changesBetween(spark, root, 1L, 5L, Seq("k"))
    val plan = diff.queryExecution.optimizedPlan.toString
    assert(!plan.contains("FullOuter"),
      s"expected the positional event fold, got a snapshot diff:\n$plan")
    assert(diff.collect().map(_.toSeq).toSet == Set(
      Seq("delete", 1, "a", null, "x1", null),
      Seq("update", 2, "a", "a", "x2", "X2"),
      Seq("insert", 4, null, "b", null, "x4")),
      diff.collect().map(_.toSeq).toSet.toString)
    // parity with the snapshot-diff oracle computed directly
    val before = SnapshotLog.readVersion(spark, root, 1L)
    val after = SnapshotLog.readVersion(spark, root, 5L)
    assert(before.count() == 3 && after.count() == 3)
    assert(after.filter($"k" === 2).head.getString(2) == "X2")
  }

  test("change files respect lifecycle: vacuum reclaims them; feed-off commits write none") {
    val root = freshRoot()
    withFeed {
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "x")).toDF("k", "gp", "v"), Seq("k"), "gp")
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "y")).toDF("k", "gp", "v"), Seq("k"), "gp")
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "z")).toDF("k", "gp", "v"), Seq("k"), "gp")
    }
    def chg(v: Long): java.io.File =
      new java.io.File(new java.io.File(root), f"chg_v$v%08d")
    assert(chg(1).isDirectory && chg(2).isDirectory && chg(3).isDirectory)
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(!chg(1).exists && !chg(2).exists, "vacuum must reclaim change dirs")
    assert(chg(3).isDirectory)
    // feed off: a scoped commit records no change dir and the stream
    // refuses it as before
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "w")).toDF("k", "gp", "v"), Seq("k"), "gp")
    assert(!chg(4).exists)
  }

  test("feed-enabled keyed upsert keeps its statsCols: the sidecar still skips files") {
    val root = freshRoot()
    def stats(v: Long): String = {
      val txt = new java.io.File(s"$root/_graft_log/" + f"v$v%08d.stats")
      if (txt.isFile)
        new String(java.nio.file.Files.readAllBytes(txt.toPath))
      else ""
    }
    SnapshotLog.commit(spark, root,
      (0 until 100).map(k => (k, s"v$k")).toDF("k", "v"),
      statsCols = Seq("k")) // v1
    assert(stats(1).contains("k\t"), "wiring check: v1 sidecar has k spans")
    withFeed {
      SnapshotLog.upsert(spark, root,
        Seq((1, "X1"), (999, "x999")).toDF("k", "v"), Seq("k"),
        statsCols = Seq("k")) // v2: feed path must NOT drop statsCols
    }
    assert(stats(2).contains("k\t"),
      "enabling the change feed silently dropped the upsert's statsCols " +
      "from the committed version's sidecar")
  }

  test("changesBetween spanning an appendEvolved boundary null-fills old chg frames") {
    val root = freshRoot()
    withFeed {
      SnapshotLog.appendEvolved(spark, root,
        Seq((1, "a"), (2, "b")).toDF("k", "v")) // v1 (pins schema)
      SnapshotLog.upsert(spark, root,
        Seq((1, "A"), (3, "c")).toDF("k", "v"), Seq("k")) // v2: chg under (k, v)
      SnapshotLog.appendEvolved(spark, root,
        Seq((4, "d", 40)).toDF("k", "v", "extra")) // v3: widens to (k, v, extra)
    }
    // the chg frame of v2 misses `extra`; the fold must align it to the
    // head schema (null-filled) instead of throwing on unionByName
    val diff = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
    val rows = diff.collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("update", 1, "a", "A", null, null),
      Seq("insert", 3, null, "c", null, null),
      Seq("insert", 4, null, "d", null, 40)), rows.toString)
    assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"),
      "the aligned fold must stay join-free")
  }

  test("a recorded chgDir missing on disk fails the changes stream loudly") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdf_miss_ck").toString
    val out = Files.createTempDirectory("graft_cdf_miss_out").toString
    withFeed {
      SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v")) // v1
      val q = spark.readStream.format("graft").option("changes", "true").load(root)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      try {
        q.processAllAvailable() // cursor at head
        SnapshotLog.upsert(spark, root,
          Seq((2, "b")).toDF("k", "v"), Seq("k")) // v2 records chg_v2
        // simulate partial cleanup: the manifest still records the dir
        val chg = new java.io.File(new java.io.File(root), f"chg_v${2L}%08d")
        assert(chg.isDirectory, "wiring check: v2 recorded a change dir")
        chg.listFiles().foreach(_.delete()); assert(chg.delete())
        val ex = intercept[Exception] { q.processAllAvailable() }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("missing on disk")),
          s"expected the loud missing-chgDir refusal, got: ${msgs(ex)}")
      } finally q.stop()
    }
  }

  test("publishScopedOcc sweeps chg debris above head and publishes the real change dir") {
    // a crashed commit can leave a chg_v{next} behind; recoverOrphans
    // must sweep it (it is above the committed head) so the genuine
    // publish lands its recorded change dir — and if the rename were
    // ever refused with the staged dir present, the publish now fails
    // loudly instead of silently dropping the feed (ADVICE r9)
    val root = freshRoot()
    withFeed {
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "a", "x1")).toDF("k", "gp", "v"), Seq("k"), "gp") // v1
      val s = SnapshotLog.stageScopedOcc(spark, root,
        Seq((1, "a", "X1")).toDF("k", "gp", "v"), Seq("k"), "gp")
      // plant crash debris where the commit's change dir must land
      val dst = new java.io.File(new java.io.File(root), f"chg_v${2L}%08d")
      java.nio.file.Files.write(dst.toPath, Array[Byte](1))
      assert(SnapshotLog.publishScopedOcc(spark, root, s) == 2L)
      assert(dst.isDirectory,
        "debris must be swept and the staged change dir published in place")
      val diff = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      assert(diff.collect().map(_.toSeq).toSet == Set(
        Seq("update", 1, "a", "a", "x1", "X1")))
    }
  }
}
