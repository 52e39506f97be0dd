package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round-9 directive #1: the stats/manifest sidecar as a PARQUET
  * CHECKPOINT, written and read distributively. Above the byte
  * threshold a commit must never materialize per-file stat lines on
  * the driver — the carry flows as a Dataset, the fresh footer stats
  * stay an RDD, and the union is written by executors. Reads prune
  * through a distributed job that ships back only pruned file keys.
  * These cases force checkpoint mode via the threshold conf and prove
  * (a) the write path stayed distributed (mode markers), (b) parity
  * with the text path on the same chain of commits, (c) pruning and
  * zero-listing planning still hold.
  */
class StatsCheckpointSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_statspq").toString

  private def fixture(n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("k"),
      (col("id") % 97).as("v"),
      concat(lit("cust#"), format_string("%05d", col("id") % 1000)).as("name"),
      (col("id") % 7).cast("string").as("gp"))

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val key = "graft.stats.checkpointThresholdBytes"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, bytes.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def hasPq(root: String, v: Long): Boolean =
    new java.io.File(s"$root/_graft_log/" + f"v$v%08d.statspq").isDirectory
  private def hasText(root: String, v: Long): Boolean =
    new java.io.File(s"$root/_graft_log/" + f"v$v%08d.stats").isFile

  test("checkpoint mode: commits publish parquet sidecars, never text, and stay distributed") {
    val root = tmp()
    withThreshold(0L) {
      val v1 = SnapshotLog.commit(spark, root, fixture(500).repartition(4),
        statsCols = Seq("k", "name"))
      assert(hasPq(root, v1) && !hasText(root, v1))
      assert(SnapshotLog.lastStatsMode.startsWith("parquet"))
      // v1 has no parent — carry is legitimately eager-empty there; from
      // v2 on the parent is a parquet checkpoint and carry must be a
      // Dataset end to end
      val v2 = SnapshotLog.appendCommit(spark, root,
        fixture(300).withColumn("k", col("k") + 500).repartition(3),
        statsCols = Seq("k", "name"))
      assert(hasPq(root, v2) && !hasText(root, v2))
      assert(SnapshotLog.lastStatsMode.startsWith("parquet"))
      assert(SnapshotLog.lastCarryDistributed,
        "append carry over a checkpointed parent must stay a Dataset")
      // the checkpointed chain still plans from the sidecar: complete
      // listing, correct rows
      assert(SnapshotLog.filesFromSidecar(spark, root, v2).isDefined,
        "checkpoint must still carry the complete file manifest")
      assert(SnapshotLog.read(spark, root).count() == 800)
    }
  }

  test("parity: the same chain under text and checkpoint storage reads and prunes identically") {
    val rootT = tmp(); val rootP = tmp()
    def chain(root: String): Unit = {
      SnapshotLog.commit(spark, root, fixture(400).repartition(4),
        statsCols = Seq("k", "v"))
      SnapshotLog.appendCommit(spark, root,
        fixture(200).withColumn("k", col("k") + 400).repartition(2),
        statsCols = Seq("k", "v"))
      SnapshotLog.tombstoneDelete(spark, root,
        Seq(5L, 17L, 599L).toDF("k"), Seq("k"))
      SnapshotLog.appendCommit(spark, root,
        fixture(100).withColumn("k", col("k") + 600).repartition(2),
        statsCols = Seq("k", "v"))
    }
    chain(rootT) // default threshold: text sidecars
    withThreshold(0L) { chain(rootP) } // checkpoint sidecars
    assert(hasText(rootT, SnapshotLog.currentVersion(spark, rootT).get))
    assert(hasPq(rootP, SnapshotLog.currentVersion(spark, rootP).get))
    // identical visible rows
    val a = SnapshotLog.read(spark, rootT).orderBy("k").collect()
    val b = SnapshotLog.read(spark, rootP).orderBy("k").collect()
    assert(a.toSeq == b.toSeq)
    // identical skipping decisions (kept count and total) for a range
    // probe that genuinely prunes: the first commit's k-span per file is
    // a ~100-wide slice of [0, 400)
    val (keptT, totT) = SnapshotLog.candidateFiles(spark, rootT,
      SnapshotLog.currentVersion(spark, rootT).get, "k", 0L, 50L)
    val (keptP, totP) = SnapshotLog.candidateFiles(spark, rootP,
      SnapshotLog.currentVersion(spark, rootP).get, "k", 0L, 50L)
    assert(totT == totP)
    assert(keptT.size == keptP.size)
    assert(keptP.size < totP, "the probe must actually prune files")
    // identical filtered reads through the pruning index
    val fa = SnapshotLog.readPruned(spark, rootT).filter($"k" < 100).agg(sum("v")).head.getLong(0)
    val fb = SnapshotLog.readPruned(spark, rootP).filter($"k" < 100).agg(sum("v")).head.getLong(0)
    assert(fa == fb)
    // deltaBytesOf agrees (streaming admission control input)
    (1L to 4L).foreach { v =>
      assert(SnapshotLog.deltaBytesOf(spark, rootT, v) ==
             SnapshotLog.deltaBytesOf(spark, rootP, v),
        s"deltaBytesOf drifted at v$v")
    }
  }

  test("scoped upsert over a checkpointed parent: carry filter runs distributed, untouched leafs carry") {
    val root = tmp()
    withThreshold(0L) {
      SnapshotLog.upsertScoped(spark, root, fixture(700), Seq("k"), "gp",
        statsCols = Seq("k"))
      val batch = fixture(700).filter($"gp" === "3")
        .withColumn("v", lit(-1L))
      SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "gp",
        statsCols = Seq("k"))
      assert(SnapshotLog.lastStatsMode == "parquet")
      assert(SnapshotLog.lastCarryDistributed,
        "scoped carry filter over a checkpointed parent must stay a Dataset")
      val head = SnapshotLog.currentVersion(spark, root).get
      // the untouched leafs' listing carried: planning is sidecar-complete
      assert(SnapshotLog.filesFromSidecar(spark, root, head).isDefined)
      val got = SnapshotLog.read(spark, root)
      assert(got.count() == 700)
      assert(got.filter($"gp" === "3" && $"v" =!= -1L).count() == 0)
      assert(got.filter($"gp" === "2" && $"v" === -1L).count() == 0)
      // dir-name partition pruning still live in checkpoint mode
      val pruned = SnapshotLog.readPruned(spark, root).filter($"gp" === "3")
      assert(pruned.count() == 100)
    }
  }

  test("a text chain outgrowing the threshold migrates to checkpoint storage mid-chain") {
    val root = tmp()
    withThreshold(3000L) {
      val v1 = SnapshotLog.commit(spark, root, fixture(200).repartition(2),
        statsCols = Seq("k", "v", "name"))
      assert(hasText(root, v1), "first small commit stays text")
      // grow: each append adds listing + span lines; the chain crosses
      // 3000 bytes and the NEXT commit must publish parquet
      var v = v1
      var migrated = false
      (0 until 8).foreach { i =>
        v = SnapshotLog.appendCommit(spark, root,
          fixture(100).withColumn("k", col("k") + 1000 * (i + 1)).repartition(2),
          statsCols = Seq("k", "v", "name"))
        migrated = migrated || hasPq(root, v)
      }
      assert(migrated, "chain never migrated to checkpoint storage")
      assert(hasPq(root, v) && !hasText(root, v))
      assert(SnapshotLog.read(spark, root).count() == 1000)
      // pruning still exact across the text→parquet boundary
      val (kept, tot) = SnapshotLog.candidateFiles(spark, root, v, "k", 1000L, 1050L)
      assert(kept.size < tot)
      assert(SnapshotLog.readPruned(spark, root)
        .filter($"k" >= 1000L && $"k" <= 1050L).count() == 51)
    }
  }

  test("vacuum pins chained ancestors, reclaims after consolidation") {
    val root = tmp()
    withThreshold(0L) {
      SnapshotLog.commit(spark, root, fixture(100), statsCols = Seq("k"))
      SnapshotLog.appendCommit(spark, root,
        fixture(100).withColumn("k", col("k") + 100), statsCols = Seq("k"))
      SnapshotLog.appendCommit(spark, root,
        fixture(100).withColumn("k", col("k") + 200), statsCols = Seq("k"))
      assert(hasPq(root, 1L) && hasPq(root, 2L) && hasPq(root, 3L))
      // v2/v3 are chained deltas over v1 — vacuum keeps the referenced
      // ancestors alive exactly like shared data dirs
      assert(SnapshotLog.statsStackOf(spark, root, 3L) == Seq(2L, 1L))
      SnapshotLog.vacuum(spark, root, keep = 1)
      assert(hasPq(root, 1L) && hasPq(root, 2L) && hasPq(root, 3L),
        "vacuum must not break the retained head's stats chain")
      assert(SnapshotLog.read(spark, root).count() == 300)
      assert(SnapshotLog.filesFromSidecar(spark, root, 3L).isDefined)
      // a compaction rewrites (filtered carry → consolidated checkpoint);
      // the next vacuum then reclaims the whole dead chain
      SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 30)
      assert(SnapshotLog.statsStackOf(spark, root,
        SnapshotLog.currentVersion(spark, root).get).isEmpty)
      SnapshotLog.vacuum(spark, root, keep = 1)
      assert(!hasPq(root, 1L) && !hasPq(root, 2L) && !hasPq(root, 3L),
        "a consolidated head releases its ancestors")
      assert(SnapshotLog.read(spark, root).count() == 300)
    }
  }

  test("chained checkpoints: appends write O(batch) delta files; depth limit consolidates") {
    val root = tmp()
    val key = "graft.stats.checkpointChainDepth"
    withThreshold(0L) {
      spark.conf.set(key, "3")
      try {
        (0 until 5).foreach { i =>
          SnapshotLog.appendCommit(spark, root,
            fixture(100).withColumn("k", col("k") + i * 1000L),
            statsCols = Seq("k"))
        }
        // v1 full; v2, v3 chain (depth 1, 2); v4 would be depth 3 →
        // consolidated full; v5 chains over v4
        assert(SnapshotLog.statsStackOf(spark, root, 1L).isEmpty)
        assert(SnapshotLog.statsStackOf(spark, root, 2L) == Seq(1L))
        assert(SnapshotLog.statsStackOf(spark, root, 3L) == Seq(2L, 1L))
        assert(SnapshotLog.statsStackOf(spark, root, 4L).isEmpty,
          "depth limit must consolidate into a full checkpoint")
        assert(SnapshotLog.statsStackOf(spark, root, 5L) == Seq(4L))
        // a chained delta holds ONLY its own commit's rows: v5's dir
        // carries a fifth of the consolidated v4's records (byte sizes
        // are noise at this scale — parquet framing dominates)
        def pqRows(v: Long): Long = spark.read.parquet(
          s"$root/_graft_log/" + f"v$v%08d.statspq").count()
        assert(pqRows(5L) < pqRows(4L) / 2,
          s"delta ${pqRows(5L)} rows should be far fewer than full ${pqRows(4L)}")
        // reads resolve the stack: full manifest, spans, exact rows
        assert(SnapshotLog.read(spark, root).count() == 500)
        assert(SnapshotLog.filesFromSidecar(spark, root, 5L).get.size ==
          new java.io.File(root).listFiles()
            .filter(_.getName.startsWith("data_v"))
            .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet")))
        val (kept, tot) = SnapshotLog.candidateFiles(spark, root, 5L, "k", 4000L, 4099L)
        assert(kept.size < tot, "stacked spans must still prune")
        assert(SnapshotLog.readPruned(spark, root)
          .filter($"k" >= 4000L && $"k" < 4100L).count() == 100)
        // the operational surface reports the chain
        assert(SnapshotLog.describeDetail(spark, root).statsStorage ==
          "chained(depth=2)")
      } finally spark.conf.unset(key)
    }
  }

  test("10k-file chain: commits stay distributed and planning stays sidecar-complete") {
    val root = tmp()
    // 10 commits × 1000 files = a 10⁴-file table. Forced checkpoint mode:
    // at no point may a commit collect per-file stat lines (the mode
    // markers assert the storage and carry stayed distributed — the
    // parquet path has no driver materialization by construction).
    withThreshold(0L) {
      (0 until 10).foreach { i =>
        SnapshotLog.appendCommit(spark, root,
          spark.range(1000).select(
            (col("id") + i * 1000L).as("k"), (col("id") % 13).as("v"))
            .repartitionByRange(1000, col("k")),
          statsCols = Seq("k"))
        assert(SnapshotLog.lastStatsMode.startsWith("parquet"))
        if (i > 0) {
          assert(SnapshotLog.lastStatsMode == "parquet-delta",
            "an append over a checkpointed parent must chain, not rewrite")
          assert(SnapshotLog.lastCarryDistributed)
        }
      }
      val head = SnapshotLog.currentVersion(spark, root).get
      val files = SnapshotLog.filesFromSidecar(spark, root, head)
      assert(files.isDefined, "10k-file manifest must resolve from the sidecar")
      // the manifest must list EXACTLY the files on disk (range
      // partitioning may merge a couple of boundary partitions — compare
      // against the ground truth, not a guessed constant)
      val onDisk = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("data_v"))
        .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
      assert(files.get.size == onDisk,
        s"sidecar lists ${files.get.size} files, disk has $onDisk")
      assert(onDisk >= 8000, s"chain too small to prove the regime: $onDisk files")
      // span pruning: a one-commit window keeps ≤ ~1/8 of the files
      val (kept, tot) = SnapshotLog.candidateFiles(spark, root, head, "k", 2000L, 2999L)
      assert(tot == onDisk)
      assert(kept.size <= tot / 8, s"kept ${kept.size} of $tot — pruning not effective")
      assert(SnapshotLog.readPruned(spark, root)
        .filter($"k" >= 2000L && $"k" < 3000L).count() == 1000)
    }
  }
}
