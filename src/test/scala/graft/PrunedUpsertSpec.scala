package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round-10 directive #1: FILE-GRANULAR keyed upsert / MERGE on flat
  * tables — the Delta "touched files" rule. A keyed upsert probes the
  * skipping sidecar with the batch's keys, reads and merges ONLY the
  * files that may contain a batch key, and carries every other file BY
  * REFERENCE: untouched bytes are never read and never rewritten, and
  * the commit is O(matched files) + O(batch) instead of O(table).
  */
class PrunedUpsertSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pupsert").toString + "/t"

  /** Four appended versions with per-dir-disjoint k ranges, one file
    * each, spans recorded for k — 4 dirs, 4 files.
    */
  private def chain(root: String, bloom: Boolean = false): Unit =
    (0 until 4).foreach { i =>
      val batch = ((i * 100) until (i * 100 + 100))
        .map(k => (k, s"w$k")).toDF("k", "w").coalesce(1)
      SnapshotLog.appendCommit(spark, root, batch,
        statsCols = Seq("k"), bloomCols = if (bloom) Seq("k") else Nil)
    }

  private def filesUnder(root: String, dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(new java.io.File(root), dir)
    if (!d.isDirectory) Map.empty
    else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("point MERGE rewrites only the matched file; untouched dirs byte-identical; rows exact") {
    val root = freshRoot()
    chain(root)
    val before = Seq("data_v00000001", "data_v00000003", "data_v00000004")
      .map(d => d -> filesUnder(root, d)).toMap
    val oracle = graft.sources.Upsert.upsert(
      SnapshotLog.readVersion(spark, root, 4L),
      Seq((150, "W150"), (9999, "w9999")).toDF("k", "w"), Seq("k"))
      .collect().map(_.toSeq).toSet
    // update k=150 (lives in data_v2's span) + insert k=9999 (no span)
    val v5 = SnapshotLog.upsert(spark, root,
      Seq((150, "W150"), (9999, "w9999")).toDF("k", "w"), Seq("k"),
      statsCols = Seq("k"))
    assert(v5 == 5L)
    // manifest: dirs 1/3/4 carried whole, dir 2 replaced by the new dir
    val dirs = SnapshotLog.dirsOf(spark, root, 5L)
    assert(dirs.toSet == Set("data_v00000001", "data_v00000003",
      "data_v00000004", "data_v00000005"), dirs.toString)
    // untouched dirs: every file byte- and mtime-identical
    Seq("data_v00000001", "data_v00000003", "data_v00000004").foreach { d =>
      assert(filesUnder(root, d) == before(d), s"$d was touched")
    }
    assert(SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet == oracle)
  }

  test("partially matched dir dissolves into per-file carries; zero-LIST listing survives") {
    val root = freshRoot()
    // ONE dir, TWO files with disjoint k ranges
    SnapshotLog.appendCommit(spark, root,
      (0 until 200).map(k => (k, s"w$k")).toDF("k", "w")
        .repartitionByRange(2, $"k"), statsCols = Seq("k"))
    val v2 = SnapshotLog.upsert(spark, root,
      Seq((5, "W5")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    assert(v2 == 2L)
    val dirs = SnapshotLog.dirsOf(spark, root, 2L)
    val fileEntries = dirs.filter(_.endsWith(".parquet"))
    assert(fileEntries.size == 1 &&
      fileEntries.head.startsWith("data_v00000001/"), dirs.toString)
    assert(dirs.contains("data_v00000002"))
    // the carried file resolves through the sidecar listing (zero-LIST)
    val listed = SnapshotLog.filesFromSidecar(spark, root, 2L)
    assert(listed.isDefined, "file entries must keep the listing complete")
    // DESCRIBE DETAIL surfaces the carry count (the defrag signal)
    assert(SnapshotLog.describeDetail(spark, root).numFileCarries == 1)
    assert(listed.get.map(_.getPath.getName).toSet.size == listed.get.size)
    // row parity with a full-snapshot merge
    val got = SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet
    val want = (0 until 200).map(k =>
      Seq[Any](k, if (k == 5) "W5" else s"w$k")).toSet
    assert(got == want)
    // a SECOND pruned upsert composes on top: hitting the REWRITTEN
    // dir's range carries the file entry through untouched…
    val v3 = SnapshotLog.upsert(spark, root,
      Seq((50, "W50")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    assert(v3 == 3L)
    val dirs3 = SnapshotLog.dirsOf(spark, root, 3L)
    assert(dirs3.toSet == Set(fileEntries.head, "data_v00000003"), dirs3.toString)
    // …and hitting the CARRIED file's range consumes the file entry
    val v4 = SnapshotLog.upsert(spark, root,
      Seq((150, "W150")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    assert(v4 == 4L)
    val dirs4 = SnapshotLog.dirsOf(spark, root, 4L)
    assert(dirs4.toSet == Set("data_v00000003", "data_v00000004"), dirs4.toString)
    val got4 = SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet
    val want4 = (0 until 200).map(k =>
      Seq[Any](k, if (k == 5) "W5" else if (k == 50) "W50"
                  else if (k == 150) "W150" else s"w$k")).toSet
    assert(got4 == want4)
  }

  test("carried spans still skip files after the pruned merge") {
    val root = freshRoot()
    chain(root)
    SnapshotLog.upsert(spark, root,
      Seq((150, "X")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    // range probe over a CARRIED dir's span: only its one file survives
    val kept = SnapshotLog.readBetween(spark, root, "k", 310, 320)
    assert(kept.inputFiles.length == 1, kept.inputFiles.toSeq.toString)
    assert(kept.collect().length == 11)
  }

  test("change feed: pruned merge records exact O(matched) change rows") {
    val root = freshRoot()
    chain(root)
    spark.conf.set("graft.changeFeed.enabled", "true")
    try {
      SnapshotLog.upsert(spark, root,
        Seq((150, "W150"), (151, "w151"), (9999, "w9999")).toDF("k", "w"),
        Seq("k"), statsCols = Seq("k")) // update 150, no-op 151, insert 9999
      val diff = SnapshotLog.changesBetween(spark, root, 4L, 5L, Seq("k"))
      assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"),
        "recorded change files must make the fold join-free")
      assert(diff.collect().map(_.toSeq).toSet == Set(
        Seq("update", 150, "w150", "W150"),
        Seq("insert", 9999, null, "w9999")))
    } finally spark.conf.unset("graft.changeFeed.enabled")
  }

  test("null batch keys disable pruning but merge null-safe and exactly") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((Some(1), "a"), (None, "nullrow")).toDF("k", "w").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      Seq((Some(2), "b")).toDF("k", "w").coalesce(1), statsCols = Seq("k"))
    SnapshotLog.upsert(spark, root,
      Seq((None, "NULLROW"), (Some(3), "c")).toDF("k", "w"), Seq("k"))
    val got = SnapshotLog.read(spark, root).collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getString(1)).toSet
    assert(got == Set(1 -> "a", 2 -> "b", 3 -> "c", -1 -> "NULLROW"),
      got.toString)
  }

  test("a wide batch (> point-probe cap) takes the span path and stays exact") {
    val root = freshRoot()
    chain(root)
    // 30 distinct keys inside dirs 2 and 3's spans
    val batch = (150 until 180).map(k => (k, s"X$k")).toDF("k", "w")
    val before1 = filesUnder(root, "data_v00000001")
    SnapshotLog.upsert(spark, root, batch, Seq("k"), statsCols = Seq("k"))
    // span [150, 179] overlaps dir 2 only — dirs 1/3/4 carried
    val dirs = SnapshotLog.dirsOf(spark, root, 5L)
    assert(dirs.toSet == Set("data_v00000001", "data_v00000003",
      "data_v00000004", "data_v00000005"), dirs.toString)
    assert(filesUnder(root, "data_v00000001") == before1)
    val got = SnapshotLog.read(spark, root)
      .filter($"k".between(140, 190)).collect().map(_.toSeq).toSet
    val want = (140 to 190).map(k =>
      Seq[Any](k, if (k >= 150 && k < 180) s"X$k" else s"w$k")).toSet
    assert(got == want)
  }

  test("deletion vectors stay dead through a pruned merge") {
    val root = freshRoot()
    chain(root)
    SnapshotLog.tombstoneDelete(spark, root, Seq(151).toDF("k"), Seq("k")) // v5
    SnapshotLog.upsert(spark, root,
      Seq((150, "W150")).toDF("k", "w"), Seq("k"), statsCols = Seq("k")) // v6
    val rows = SnapshotLog.read(spark, root).filter($"k".isin(150, 151))
      .collect().map(_.toSeq).toSet
    assert(rows == Set(Seq(150, "W150")),
      s"tombstoned k=151 must not resurrect: $rows")
    assert(SnapshotLog.read(spark, root).count() == 399)
  }

  test("vacuum reclaims replaced files but keeps carried ones; reads survive") {
    val root = freshRoot()
    // one dir, two files; pruned merge carries one file individually
    SnapshotLog.appendCommit(spark, root,
      (0 until 200).map(k => (k, s"w$k")).toDF("k", "w")
        .repartitionByRange(2, $"k"), statsCols = Seq("k"))
    SnapshotLog.upsert(spark, root,
      Seq((5, "W5")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    val carried = SnapshotLog.dirsOf(spark, root, 2L)
      .filter(_.endsWith(".parquet")).head.split('/').last
    SnapshotLog.vacuum(spark, root, keep = 1)
    val v1Files = filesUnder(root, "data_v00000001")
    assert(v1Files.keySet == Set(carried),
      s"matched file must be reclaimed, carried kept: ${v1Files.keySet}")
    val got = SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet
    val want = (0 until 200).map(k =>
      Seq[Any](k, if (k == 5) "W5" else s"w$k")).toSet
    assert(got == want)
  }

  test("compactSmallFiles repacks per-file carries; appends compose after") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 200).map(k => (k, s"w$k")).toDF("k", "w")
        .repartitionByRange(2, $"k"), statsCols = Seq("k"))
    SnapshotLog.upsert(spark, root,
      Seq((5, "W5")).toDF("k", "w"), Seq("k"), statsCols = Seq("k")) // v2
    SnapshotLog.appendCommit(spark, root,
      Seq((500, "w500")).toDF("k", "w").coalesce(1), statsCols = Seq("k")) // v3
    val v4 = SnapshotLog.compactSmallFiles(spark, root, 1L << 30)
    assert(v4 == 4L)
    val dirs = SnapshotLog.dirsOf(spark, root, 4L)
    assert(!dirs.exists(_.endsWith(".parquet")),
      s"compaction must fold file carries back into dirs: $dirs")
    val got = SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet
    val want = ((0 until 200).map(k =>
      Seq[Any](k, if (k == 5) "W5" else s"w$k")) :+ Seq[Any](500, "w500")).toSet
    assert(got == want)
  }

  test("no stats / nothing pruned falls back to the classic full rewrite") {
    val root = freshRoot()
    // no statsCols anywhere: no spans, so nothing can prune
    SnapshotLog.commit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "w"))
    val v2 = SnapshotLog.upsert(spark, root,
      Seq((1, "A"), (3, "c")).toDF("k", "w"), Seq("k"))
    assert(v2 == 2L)
    assert(SnapshotLog.dirsOf(spark, root, 2L) == Seq("data_v00000002"),
      "classic path: one fresh full dir")
    assert(SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet ==
      Set(Seq(1, "A"), Seq(2, "b"), Seq(3, "c")))
  }

  test("pruned merge composes with column mapping: renamed lineage, physical files") {
    val root = freshRoot()
    chain(root)
    SnapshotLog.renameColumn(spark, root, "w", "word") // v5: metadata-only
    val before1 = filesUnder(root, "data_v00000001")
    val v6 = SnapshotLog.upsert(spark, root,
      Seq((150, "W150")).toDF("k", "word"), Seq("k"), statsCols = Seq("k"))
    assert(v6 == 6L)
    // untouched dirs still byte-identical; only dir 2's file rewritten
    assert(filesUnder(root, "data_v00000001") == before1)
    val dirs = SnapshotLog.dirsOf(spark, root, 6L)
    assert(dirs.toSet == Set("data_v00000001", "data_v00000003",
      "data_v00000004", "data_v00000006"), dirs.toString)
    // the rewritten file spells the PHYSICAL name; reads stay logical
    val got = SnapshotLog.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "word"))
    assert(got.filter($"k".isin(150, 151)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set(150 -> "W150", 151 -> "w151"))
    // skipping still prunes on the carried spans after the mapped merge
    val kept = SnapshotLog.readBetween(spark, root, "k", 310, 320)
    assert(kept.inputFiles.length == 1, kept.inputFiles.toSeq.toString)
  }

  test("a keyed full rewrite inherits the head's stat columns instead of stripping them") {
    val root = freshRoot()
    chain(root)
    def stats(v: Long): String = {
      val txt = new java.io.File(s"$root/_graft_log/" + f"v$v%08d.stats")
      if (txt.isFile)
        new String(java.nio.file.Files.readAllBytes(txt.toPath))
      else ""
    }
    // a batch spanning every file prunes nothing → classic full
    // rewrite; the caller passes NO statsCols, yet the lineage's k
    // spans must survive the rewrite
    val wide = (0 until 400 by 10).map(k => (k, s"X$k")).toDF("k", "w")
    val v5 = SnapshotLog.upsert(spark, root, wide, Seq("k"))
    assert(SnapshotLog.dirsOf(spark, root, v5) == Seq(f"data_v$v5%08d"),
      "wiring: the wide batch must take the full-rewrite path")
    assert(stats(v5).contains("k\t"),
      "full rewrite stripped the inherited stat columns")
    val kept = SnapshotLog.readBetween(spark, root, "k", 0, 50)
    assert(kept.inputFiles.length < SnapshotLog.filesFromSidecar(spark, root, v5).get.size
      || SnapshotLog.filesFromSidecar(spark, root, v5).get.size == 1)
    // deleteByKey keeps them too
    val v6 = SnapshotLog.deleteByKey(spark, root, Seq(5).toDF("k"), Seq("k"))
    assert(stats(v6).contains("k\t"),
      "deleteByKey rewrite stripped the inherited stat columns")
  }

  test("deleteByKey prunes too: only files holding a doomed key rewrite") {
    val root = freshRoot()
    chain(root)
    val before1 = filesUnder(root, "data_v00000001")
    spark.conf.set("graft.changeFeed.enabled", "true")
    try {
      val v5 = SnapshotLog.deleteByKey(spark, root, Seq(150).toDF("k"), Seq("k"))
      assert(v5 == 5L)
      val dirs = SnapshotLog.dirsOf(spark, root, 5L)
      assert(dirs.toSet == Set("data_v00000001", "data_v00000003",
        "data_v00000004", "data_v00000005"), dirs.toString)
      assert(filesUnder(root, "data_v00000001") == before1)
      assert(SnapshotLog.read(spark, root).count() == 399)
      assert(SnapshotLog.read(spark, root).filter($"k" === 150).count() == 0)
      // the feed recorded the delete exactly, join-free
      val diff = SnapshotLog.changesBetween(spark, root, 4L, 5L, Seq("k"))
      assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"))
      assert(diff.collect().map(_.toSeq).toSet ==
        Set(Seq("delete", 150, "w150", null)))
    } finally spark.conf.unset("graft.changeFeed.enabled")
  }

  test("time travel to the pre-merge version still reads the old bytes") {
    val root = freshRoot()
    chain(root)
    SnapshotLog.upsert(spark, root,
      Seq((150, "W150")).toDF("k", "w"), Seq("k"), statsCols = Seq("k"))
    val old = SnapshotLog.readVersion(spark, root, 4L)
      .filter($"k" === 150).collect()
    assert(old.map(_.getString(1)).toSeq == Seq("w150"))
    val now = SnapshotLog.read(spark, root).filter($"k" === 150).collect()
    assert(now.map(_.getString(1)).toSeq == Seq("W150"))
  }
}
