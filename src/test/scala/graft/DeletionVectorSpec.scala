package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** Merge-on-read deletes (round-6 VERDICT item 5): a delete commit
  * writes an O(deleted rows) positional sidecar and NO data files;
  * readers, CDC, skipping reads, scoped upserts and append chains all
  * see the deletion; compaction folds it; vacuum reclaims the vector.
  */
class DeletionVectorSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dv").toString + "/table"

  private def kv(pairs: (Int, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("tombstone delete rewrites no data file; readers and time travel stay exact") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(4))
    val before = fileState(new java.io.File(root, "data_v00000001"))
    val v2 = SnapshotLog.tombstoneDelete(spark, root, Seq(5, 60).toDF("k"), Seq("k"))
    assert(v2 == 2L)
    // the delete touched ZERO data files…
    assert(fileState(new java.io.File(root, "data_v00000001")) == before,
      "tombstone delete must not rewrite data files")
    assert(!new java.io.File(root, "data_v00000002").exists(),
      "a delete commit stages no data dir")
    assert(new java.io.File(root, "tomb_v00000002").exists())
    // …but readers see the rows gone, and time travel still has them
    val now = rows(SnapshotLog.read(spark, root))
    assert(now.size == 98 && !now.exists(r => r._1 == 5 || r._1 == 60))
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)).size == 100)
  }

  test("updateWhere: merge-on-read UPDATE rewrites no pre-existing file, costs O(matched)") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(4))
    val before = fileState(new java.io.File(root, "data_v00000001"))
    val v2 = SnapshotLog.updateWhere(spark, root,
      base => base("k") % 10 === 0,
      Map("v" -> concat(lit("upd_"), col("v"))))
    assert(v2 == 2L)
    // ONE commit: old files untouched, a tomb dir hides the 10 old
    // copies, a new data dir carries exactly the 10 rewrites
    assert(fileState(new java.io.File(root, "data_v00000001")) == before,
      "updateWhere must not rewrite pre-existing data files")
    assert(new java.io.File(root, "tomb_v00000002").exists())
    assert(new java.io.File(root, "data_v00000002").exists())
    assert(spark.read.parquet(root + "/data_v00000002").count() == 10)
    val now = rows(SnapshotLog.read(spark, root))
    assert(now.size == 100)
    assert(now.filter(_._2.startsWith("upd_")).map(_._1) ==
      (10 to 100 by 10).toSet)
    assert(now.contains(10 -> "upd_v10") && now.contains(7 -> "v7"))
    // time travel still has the originals
    assert(rows(SnapshotLog.readVersion(spark, root, 1L))
      .forall(!_._2.startsWith("upd_")))
    // a second update composes: rows hidden by v2's vector must not
    // resurrect, and updated rows (new files) are themselves updatable
    val v3 = SnapshotLog.updateWhere(spark, root,
      base => base("k") === 10 || base("k") === 7,
      Map("v" -> lit("twice")))
    assert(v3 == 3L)
    val after = rows(SnapshotLog.read(spark, root))
    assert(after.size == 100)
    assert(after.contains(10 -> "twice") && after.contains(7 -> "twice"))
    assert(after.contains(20 -> "upd_v20"))
    // a predicate matching nothing is a NO-OP: no version bump, no dirs
    val v4 = SnapshotLog.updateWhere(spark, root,
      base => base("k") > 1000, Map("v" -> lit("never")))
    assert(v4 == 3L)
    assert(!new java.io.File(root, "tomb_v00000004").exists())
    assert(!new java.io.File(root, "data_v00000004").exists())
  }

  test("updateWhere composes with additive schema evolution (pinned-schema scan)") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    // widen, then update on a PRE-evolution column: the positional scan
    // must use the pinned schema (old files null-fill `n`), and the
    // rewritten rows must carry the widened shape
    SnapshotLog.appendEvolved(spark, root,
      Seq((3, "c", 30)).toDF("k", "v", "n"))
    SnapshotLog.updateWhere(spark, root,
      base => base("v") === "b", Map("v" -> lit("B")))
    val got = SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(got == Set((1, "a", None), (2, "B", None), (3, "c", Some(30))))
    // and updating on the POST-evolution column touches only its rows
    SnapshotLog.updateWhere(spark, root,
      base => base("n") === 30, Map("n" -> (col("n") + 1)))
    val got2 = SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(got2 == Set((1, "a", None), (2, "B", None), (3, "c", Some(31))))
  }

  test("re-inserted keys survive older tombstones: deletion is positional, not key-based") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(2).toDF("k"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a"))
    // the key returns in a NEW file: the old vector must not swallow it
    SnapshotLog.appendCommit(spark, root, kv(2 -> "reborn"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "reborn"))
  }

  test("CDC reports deletes; the append short-circuit cannot hide them") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b", 3 -> "c"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(2).toDF("k"), Seq("k"))
    // dirs are IDENTICAL between v1 and v2 — only the vector changed; a
    // naive chain-prefix check would emit an empty feed here
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(feed == Set(("delete", 2)), feed.toString)
  }

  test("skipping reads (readBetween/readEquals) apply the vector after pruning") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 64).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k")),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(10, 40).toDF("k"), Seq("k"))
    val got = SnapshotLog.readBetween(spark, root, "k", 8, 12)
      .select("k").as[Int].collect().toSet
    assert(got == Set(8, 9, 11, 12), got.toString)
    assert(SnapshotLog.readEquals(spark, root, "k", 40).count() == 0)
    assert(SnapshotLog.readEquals(spark, root, "k", 41).count() == 1)
    // carried stats still prune files on the post-delete version
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 2L, "k", 8, 12)
    assert(kept.size < total, s"carried stats must still prune: ${kept.size}/$total")
  }

  test("scoped upsert composes: deletions persist in untouched partitions, fold in touched ones") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "b", "y2"))
        .toDF("k", "p", "v"),
      Seq("k"), "p")
    SnapshotLog.tombstoneDelete(spark, root, Seq(2, 4).toDF("k"), Seq("k"))
    // touch partition a only: its deletion folds into the rewrite, b's
    // deletion must keep applying through the carried vector
    SnapshotLog.upsertScoped(spark, root,
      Seq((5, "a", "x5")).toDF("k", "p", "v"), Seq("k"), "p")
    val now = SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(now == Set((1, "a", "x1"), (3, "b", "y1"), (5, "a", "x5")), now.toString)
  }

  test("compactChain folds vectors into data; vacuum reclaims the vector dirs") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b", 3 -> "c"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(2).toDF("k"), Seq("k"))
    val v3 = SnapshotLog.compactChain(spark, root)
    assert(rows(SnapshotLog.readVersion(spark, root, v3)) == Set(1 -> "a", 3 -> "c"))
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(!new java.io.File(root, "tomb_v00000002").exists(),
      "folded vector dir should be reclaimed")
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 3 -> "c"))
  }
}
