package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** Partition-scoped keyed upsert (round-6 VERDICT item 1): keyed merges
  * must commit O(touched partitions), not rewrite the table — untouched
  * partitions carried by reference, byte-identical; CDC stays exact;
  * skipping stats carry; vacuum reference-counts at leaf granularity.
  */
class ScopedUpsertSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_scoped").toString + "/table"

  private def t(ps: (Int, String, String)*): DataFrame =
    ps.toSeq.toDF("k", "p", "v")

  private def rows(df: DataFrame): Set[(Int, String, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  /** (relative path → (bytes, mtime)) of every parquet file under dir. */
  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("scoped upsert merges like full upsert but rewrites only touched partitions") {
    val root = freshRoot()
    val v1 = SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "c", "z1")),
      keys = Seq("k"), partitionCol = "p")
    assert(v1 == 1L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "c", "z1")))
    // snapshot the untouched partitions' files before the next commit
    val bBefore = fileState(new java.io.File(root, "data_v00000001/__gp=b"))
    val cBefore = fileState(new java.io.File(root, "data_v00000001/__gp=c"))
    assert(bBefore.nonEmpty && cBefore.nonEmpty)
    // batch touches ONLY partition a: update k=2, insert k=5
    val v2 = SnapshotLog.upsertScoped(spark, root,
      t((2, "a", "X2"), (5, "a", "x5")), keys = Seq("k"), partitionCol = "p")
    assert(v2 == 2L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x1"), (2, "a", "X2"), (3, "b", "y1"), (4, "c", "z1"),
          (5, "a", "x5")))
    // O(touched): the new version's own data dir holds ONLY partition a
    val own2 = new java.io.File(root, "data_v00000002")
    assert(own2.list().filter(_.startsWith("__gp=")).toSeq == Seq("__gp=a"),
      own2.list().toSeq.toString)
    // untouched partitions were never read, rewritten, or moved
    assert(fileState(new java.io.File(root, "data_v00000001/__gp=b")) == bBefore,
      "partition b files changed under a commit that didn't touch b")
    assert(fileState(new java.io.File(root, "data_v00000001/__gp=c")) == cBefore)
    // snapshot isolation + time travel still hold
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) ==
      Set((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "c", "z1")))
  }

  test("CDC stays exact across scoped commits; partition-adding batches ride the append path") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p")
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "X1"), (3, "a", "x3")), Seq("k"), "p")
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(feed == Set(("update", 1), ("insert", 3)), feed.toString)
    // a batch of ONLY new partitions replaces nothing: the dir chain
    // extends v2's, so the O(delta) append short-circuit serves the feed
    SnapshotLog.upsertScoped(spark, root, t((9, "z", "zz")), Seq("k"), "p")
    val feed2 = SnapshotLog.changesBetween(spark, root, 2L, 3L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(feed2 == Set(("insert", 9)), feed2.toString)
  }

  test("skipping stats carry for untouched partitions and refresh for touched ones") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "a", "x2"), (30, "b", "y1"), (40, "c", "z1")),
      Seq("k"), "p", statsCols = Seq("k"))
    SnapshotLog.upsertScoped(spark, root,
      t((2, "a", "X2"), (5, "a", "x5")), Seq("k"), "p", statsCols = Seq("k"))
    // k=30 lives only in untouched partition b: its carried line must
    // still prune partitions a and c entirely
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 2L, "k", 30, 30)
    assert(kept.nonEmpty && kept.size < total,
      s"carried stats should prune: kept ${kept.size} of $total")
    assert(kept.forall(_.toString.contains("data_v00000001/__gp=b")),
      kept.mkString(";"))
    assert(rows(SnapshotLog.readBetween(spark, root, "k", 25, 35)) ==
      Set((30, "b", "y1")))
    // the touched partition's fresh rows are found through NEW stats
    assert(rows(SnapshotLog.readBetween(spark, root, "k", 5, 5)) ==
      Set((5, "a", "x5")))
  }

  test("a plain-commit table migrates into the scoped layout once, then scopes") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, t((1, "a", "x1"), (2, "b", "y1")))
    val v2 = SnapshotLog.upsertScoped(spark, root, t((1, "a", "X1")), Seq("k"), "p")
    assert(v2 == 2L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1")))
    // migration rewrote into leafs; the NEXT scoped commit carries
    val bState = fileState(new java.io.File(root, "data_v00000002/__gp=b"))
    assert(bState.nonEmpty, "migration should produce a scoped layout")
    SnapshotLog.upsertScoped(spark, root, t((3, "a", "x3")), Seq("k"), "p")
    assert(fileState(new java.io.File(root, "data_v00000002/__gp=b")) == bState)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1"), (3, "a", "x3")))
  }

  test("partition values with path-hostile characters round-trip (escaping + manifest list)") {
    val root = freshRoot()
    val vals = Seq("plain", "a b", "x,y", "semi:colon", "sla/sh")
    val batch = vals.zipWithIndex.map { case (p, i) => (i, p, s"v$i") }
    SnapshotLog.upsertScoped(spark, root, t(batch: _*), Seq("k"), "p")
    assert(rows(SnapshotLog.read(spark, root)) == batch.toSet)
    // touch one weird partition; the others carry by reference
    SnapshotLog.upsertScoped(spark, root, t((1, "a b", "V1")), Seq("k"), "p")
    assert(rows(SnapshotLog.read(spark, root)) ==
      (batch.toSet - ((1, "a b", "v1")) + ((1, "a b", "V1"))))
  }

  test("vacuum reference-counts leaf dirs: retained leafs survive their version's death") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1"), (3, "c", "z1")), Seq("k"), "p")
    SnapshotLog.upsertScoped(spark, root, t((1, "a", "X1")), Seq("k"), "p")
    SnapshotLog.vacuum(spark, root, keep = 1)
    // v1 is gone as a version…
    assert(SnapshotLog.versions(spark, root) == Seq(2L))
    intercept[IllegalArgumentException] {
      SnapshotLog.readVersion(spark, root, 1L)
    }
    // …its replaced leaf (partition a) is reclaimed…
    assert(!new java.io.File(root, "data_v00000001/__gp=a").exists(),
      "replaced leaf should be reclaimed")
    // …but the leafs the head still references live on, and the head reads
    assert(new java.io.File(root, "data_v00000001/__gp=b").exists())
    assert(new java.io.File(root, "data_v00000001/__gp=c").exists())
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1"), (3, "c", "z1")))
  }

  test("dir-name partition pruning: the partition column prunes leafs with NO stats configured") {
    val root = freshRoot()
    // numeric partition values, deliberately spanning the "9" vs "10"
    // lexicographic trap — pruning must compare numerically
    val batch = Seq((1, 2, "a"), (2, 9, "b"), (3, 10, "c"), (4, 11, "d"))
      .toDF("k", "p", "v")
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "p") // no statsCols
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "p", 9, 10)
    assert(total >= 4 && kept.nonEmpty && kept.size < total,
      s"partition column should prune by dir name: kept ${kept.size} of $total")
    assert(kept.forall(p => p.toString.contains("__gp=9") ||
                            p.toString.contains("__gp=10")), kept.mkString(";"))
    val got = SnapshotLog.readBetween(spark, root, "p", 9, 10)
      .select("k").as[Int].collect().toSet
    assert(got == Set(2, 3), got.toString)
    // a NON-partition column with no stats keeps everything (no wrong prune)
    val (keptK, totalK) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 2, 2)
    assert(keptK.size == totalK)
    // string partitions prune too, and hostile values don't mis-decode
    val root2 = freshRoot()
    SnapshotLog.upsertScoped(spark, root2,
      t((1, "a b", "x"), (2, "q", "y")), Seq("k"), "p")
    val hit = SnapshotLog.readBetween(spark, root2, "p", "a b", "a b")
      .select("k").as[Int].collect().toSet
    assert(hit == Set(1), hit.toString)
    val (k2, t2) = SnapshotLog.candidateFiles(spark, root2, 1L, "p", "a b", "a b")
    assert(k2.size < t2, s"string partition should prune: ${k2.size}/$t2")
  }

  test("partCol survives tombstoneDelete and restore: dir-name pruning stays live") {
    val root = freshRoot()
    val batch = Seq((1, 2, "a"), (2, 9, "b"), (3, 10, "c"), (4, 11, "d"))
      .toDF("k", "p", "v")
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "p") // no statsCols
    // v2: merge-on-read delete rebuilds the manifest — partCol must carry,
    // or every later readPruned/readBetween silently scans all leafs
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(4)).toDF("k"), Seq("k"))
    val (kept2, total2) = SnapshotLog.candidateFiles(spark, root, 2L, "p", 9, 10)
    assert(kept2.nonEmpty && kept2.size < total2,
      s"delete dropped partCol: kept ${kept2.size} of $total2")
    assert(SnapshotLog.readBetween(spark, root, "p", 9, 10)
      .select("k").as[Int].collect().toSet == Set(2, 3))
    // v3: restore rebuilds the manifest again — same carry contract
    SnapshotLog.restore(spark, root, 1L)
    val (kept3, total3) = SnapshotLog.candidateFiles(spark, root, 3L, "p", 9, 10)
    assert(kept3.nonEmpty && kept3.size < total3,
      s"restore dropped partCol: kept ${kept3.size} of $total3")
    assert(SnapshotLog.readBetween(spark, root, "p", 9, 10)
      .select("k").as[Int].collect().toSet == Set(2, 3))
  }

  test("scopedBatch: replay skipped, exactly-once scoped versions") {
    val root = freshRoot()
    assert(SnapshotLog.scopedBatch(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p", 0L).contains(1L))
    assert(SnapshotLog.scopedBatch(spark, root,
      t((1, "a", "X1")), Seq("k"), "p", 1L).contains(2L))
    // post-crash replay of batch 1: skipped, nothing merged twice
    assert(SnapshotLog.scopedBatch(spark, root,
      t((1, "a", "REPLAY")), Seq("k"), "p", 1L).isEmpty)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1")))
    assert(SnapshotLog.lastBatchId(spark, root).contains(1L))
  }

  test("composite partition values containing the join characters cannot collide partitions") {
    // the multi-component __gp value escape-joins with '|': the pairs
    // ("a|b", "c") and ("a", "b|c") must land in DIFFERENT leafs, and a
    // backslash in a value must round-trip — the exact collisions an
    // unescaped join would create
    val root = freshRoot()
    val s0 = spark; import s0.implicits._
    val rows = Seq(
      (1, "a|b", "c",   "v1"),
      (2, "a",   "b|c", "v2"),
      (3, "x\\", "|y",  "v3"),
      (4, "x",   "\\|y", "v4"))
      .toDF("k", "p1", "p2", "v")
    SnapshotLog.upsertScoped(spark, root, rows, Seq("k"), "p1,p2")
    val head = SnapshotLog.currentVersion(spark, root).get
    val dirs = SnapshotLog.dirsOf(spark, root, head)
    assert(dirs.size == 4, s"4 distinct composite leafs expected, got $dirs")
    // rows read back exactly — no partition swallowed another's rows
    val got = SnapshotLog.read(spark, root).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1, "a|b", "c", "v1"), (2, "a", "b|c", "v2"),
      (3, "x\\", "|y", "v3"), (4, "x", "\\|y", "v4")), got.toString)
    // a scoped update of ONE hostile pair touches only its own leaf
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a|b", "c", "V1")).toDF("k", "p1", "p2", "v"), Seq("k"), "p1,p2")
    val after = SnapshotLog.read(spark, root)
    assert(after.filter($"k" === 1).head.getString(3) == "V1")
    assert(after.filter($"k" === 2).head.getString(3) == "v2",
      "the sibling hostile pair must be untouched")
    // dir-name pruning on a component still resolves the escaped value
    val (kept, tot) = SnapshotLog.candidateFiles(spark, root,
      SnapshotLog.currentVersion(spark, root).get, "p1", "a|b", "a|b")
    assert(kept.size < tot, s"component pruning on a hostile value: ${kept.size}/$tot")
  }

  test("append chains compose on top of a scoped table") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p")
    SnapshotLog.appendCommit(spark, root, t((7, "q", "qq")))
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x1"), (2, "b", "y1"), (7, "q", "qq")))
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(feed == Set(("insert", 7)))
  }

  // ---- round 10: PER-LEAF small-file compaction for scoped lineages

  test("compactSmallFiles packs small leafs per-partition; untouched leafs byte-identical") {
    val root = freshRoot()
    // partition "a": many small files (written at parallelism 4);
    // partition "b": one file, stays untouched
    SnapshotLog.upsertScoped(spark, root,
      (0 until 40).map(k => (k, "a", s"x$k")).toDF("k", "p", "v")
        .repartition(4),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v1
    SnapshotLog.upsertScoped(spark, root,
      t((100, "b", "y1")).coalesce(1),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v2
    def leafFiles(v: Long, leaf: String): Map[String, (Long, Long)] =
      fileState(new java.io.File(new java.io.File(root), f"data_v$v%08d/__gp=$leaf"))
    assert(leafFiles(1L, "a").size > 1, "wiring: leaf a needs many files")
    val bBefore = leafFiles(2L, "b")
    val before = rows(SnapshotLog.read(spark, root))
    val v3 = SnapshotLog.compactSmallFiles(spark, root, 1L << 30)
    assert(v3 == 3L)
    // leaf a packed into ONE file under the new version's dir; leaf b
    // carried by reference, bytes + mtimes untouched
    val dirs = SnapshotLog.dirsOf(spark, root, 3L)
    assert(dirs.toSet == Set("data_v00000002/__gp=b", "data_v00000003/__gp=a"),
      dirs.toString)
    assert(leafFiles(3L, "a").size == 1, leafFiles(3L, "a").keys.toString)
    assert(leafFiles(2L, "b") == bBefore, "untouched leaf was rewritten")
    assert(rows(SnapshotLog.read(spark, root)) == before)
    // idempotent: a second pass finds nothing to pack
    assert(SnapshotLog.compactSmallFiles(spark, root, 1L << 30) == 3L)
  }

  test("scoped compaction folds deletion vectors and keeps kept-leaf vectors live") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      (0 until 20).map(k => (k, "a", s"x$k")).toDF("k", "p", "v").repartition(3),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v1
    SnapshotLog.upsertScoped(spark, root,
      (100 until 120).map(k => (k, "b", s"y$k")).toDF("k", "p", "v").coalesce(1),
      keys = Seq("k"), partitionCol = "p") // v2
    SnapshotLog.tombstoneDelete(spark, root, Seq(5, 105).toDF("k"), Seq("k")) // v3
    val v4 = SnapshotLog.compactSmallFiles(spark, root, 1L << 30)
    assert(v4 == 4L)
    val got = rows(SnapshotLog.read(spark, root))
    assert(!got.exists(r => r._1 == 5 || r._1 == 105),
      s"tombstoned rows resurrected: $got")
    assert(got.size == 38)
    // both leafs were vector-referenced, so both packed and both
    // vectors folded — no tombstone dirs survive
    assert(SnapshotLog.dirsOf(spark, root, 4L)
      .forall(_.startsWith("data_v00000004/")), "all leafs packed")
    // vacuum reclaims the pre-compaction versions cleanly
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(rows(SnapshotLog.read(spark, root)) == got)
  }

  test("scoped compaction carries stats for kept leafs and derives them for packed ones") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      (0 until 50).map(k => (k, "a", s"x$k")).toDF("k", "p", "v").repartition(4),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v1
    SnapshotLog.upsertScoped(spark, root,
      (1000 until 1050).map(k => (k, "b", s"y$k")).toDF("k", "p", "v").coalesce(1),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v2
    SnapshotLog.compactSmallFiles(spark, root, 1L << 30) // packs leaf a
    // span skipping still prunes: a probe inside leaf b's range reads
    // only its file (carried stats), and a probe inside leaf a's range
    // reads only the packed file (freshly derived stats)
    val b = SnapshotLog.readBetween(spark, root, "k", 1010, 1020)
    assert(b.inputFiles.length == 1, b.inputFiles.toSeq.toString)
    assert(b.count() == 11)
    val a = SnapshotLog.readBetween(spark, root, "k", 10, 20)
    assert(a.inputFiles.length == 1, a.inputFiles.toSeq.toString)
    assert(a.count() == 11)
  }

  test("autoCompactEvery: the scoped sink self-maintains, replay gate intact") {
    val root = freshRoot()
    spark.conf.set("graft.scoped.autoCompactEvery", "3")
    try {
      // each batch ADDS a partition written at parallelism 3 — leafs
      // accumulate multi-file, the shape the auto-compact exists for
      (0 until 5).foreach { i =>
        val batch = (0 until 12).map(k => (i * 100 + k, s"p$i", s"b$i-$k"))
          .toDF("k", "p", "v").repartition(3)
        assert(SnapshotLog.scopedBatch(spark, root, batch,
          Seq("k"), "p", batchId = i).isDefined)
      }
      // versions: v1,v2,v3 scoped; v3%3==0 → v4 compaction; v5,v6 scoped;
      // v6%3==0 → v7 compaction
      val head = SnapshotLog.currentVersion(spark, root).get
      assert(head == 7L, s"expected 5 batches + 2 compactions, head=$head")
      // every leaf at the head is packed to one file
      SnapshotLog.dirsOf(spark, root, head).foreach { d =>
        val leaf = new java.io.File(new java.io.File(root), d)
        assert(leaf.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"$d not packed")
      }
      // replay gate survives the interleaved compactions
      assert(SnapshotLog.scopedBatch(spark, root,
        t((99, "p0", "dup")).coalesce(1), Seq("k"), "p", batchId = 4).isEmpty,
        "replayed batchId must be skipped")
      val got = rows(SnapshotLog.read(spark, root))
      val want = (0 until 5).flatMap(i =>
        (0 until 12).map(k => (i * 100 + k, s"p$i", s"b$i-$k"))).toSet
      assert(got == want, s"${got.size} rows vs ${want.size}")
    } finally spark.conf.unset("graft.scoped.autoCompactEvery")
  }

  test("streaming tail survives a scoped compaction under skipChangeCommits") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_scomp_ck").toString
    val out = Files.createTempDirectory("graft_scomp_out").toString
    SnapshotLog.upsertScoped(spark, root,
      (0 until 10).map(k => (k, "a", s"x$k")).toDF("k", "p", "v").repartition(3),
      keys = Seq("k"), partitionCol = "p") // v1
    val q = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 10)
      SnapshotLog.compactSmallFiles(spark, root, 1L << 30) // v2: packs leaf a
      SnapshotLog.appendCommit(spark, root,
        t((100, "b", "y1")).coalesce(1)) // v3: plain append on the chain
      q.processAllAvailable()
      // the compaction is skipped wholesale (no row-level change, no
      // refusal) and the append after it still flows
      val got = spark.read.parquet(out).collect()
        .map(r => r.getInt(0)).toSet
      assert(got == ((0 until 10).toSet + 100), got.toString)
    } finally q.stop()
  }
}
