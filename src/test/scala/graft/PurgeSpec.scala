package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** REORG … APPLY (PURGE) — round 12: [[SnapshotLog.purgeDeletedRows]]
  * materializes deletion vectors by rewriting EXACTLY the files they
  * reference. The contract under test: visible rows identical before
  * and after; zero tombstone dirs on the purged head; untouched files
  * byte-identical (carried by reference, per-file when their dir had a
  * purged member); skipping stats/blooms preserved for the rewrite;
  * stale-vector-only heads purge metadata-only; scoped lineages purge
  * per leaf; merge-on-read refuses toward compactMor/compactChain.
  */
class PurgeSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_purge").toString + "/table"

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("flat purge rewrites only DV'd files, drops vectors, keeps reads exact") {
    val root = freshRoot()
    // 4 files, span stats + blooms on k (keys sorted into files so a
    // 2-key delete touches a strict subset of the files)
    SnapshotLog.commit(spark, root,
      (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k"),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val before = fileState(new java.io.File(root, "data_v00000001"))
    assert(before.size == 4)
    SnapshotLog.tombstoneDelete(spark, root, Seq(5, 60).toDF("k"), Seq("k")) // v2
    val pre = rows(SnapshotLog.read(spark, root))
    assert(pre.size == 98)
    val v3 = SnapshotLog.purgeDeletedRows(spark, root)
    assert(v3 == 3L)
    // visible rows identical; the head carries no vectors
    assert(rows(SnapshotLog.read(spark, root)) == pre)
    assert(SnapshotLog.tombDirsOf(spark, root, v3).isEmpty)
    // untouched files byte-identical and carried BY REFERENCE: the
    // original dir dissolves into per-file carries for the unmatched
    // files plus the purge's own data dir
    assert(fileState(new java.io.File(root, "data_v00000001")) == before,
      "purge must not rewrite files no vector references")
    val dirs = SnapshotLog.dirsOf(spark, root, v3)
    val carries = dirs.filter(d =>
      d.startsWith("data_v00000001/") && d.endsWith(".parquet"))
    assert(carries.size == 2, s"expected 2 per-file carries, got $dirs")
    assert(dirs.contains("data_v00000003"))
    // the rewritten slice holds exactly the two matched files' survivors
    val ownRows = spark.read.parquet(root + "/data_v00000003").count()
    assert(ownRows == 98 - carries.map(c =>
      spark.read.parquet(root + "/" + c).count()).sum)
    // time travel: v2 still applies the vector, v1 has everything
    assert(rows(SnapshotLog.readVersion(spark, root, 2L)) == pre)
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)).size == 100)
    // skipping power preserved across the purge: a point probe on k
    // still prunes files (fresh stats for the rewrite, carried for the
    // untouched files)
    val (cand, total) = SnapshotLog.candidateFilesEquals(spark, root, v3, "k", 30)
    assert(cand.size < total, s"purge lost skipping power: ${cand.size}/$total")
    assert(SnapshotLog.readEquals(spark, root, "k", 30)
      .collect().map(_.getString(1)).toSeq == Seq("v30"))
    // idempotent: a vector-free head is a zero-cost no-op
    assert(SnapshotLog.purgeDeletedRows(spark, root) == v3)
    // vacuum reclaims the pre-purge versions; reads survive
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(rows(SnapshotLog.read(spark, root)) == pre)
    assert(!new java.io.File(root, "tomb_v00000002").exists(),
      "vacuum must reclaim the folded vector dir")
  }

  test("stale-vector-only head purges metadata-only (no data dir written)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(2, $"k"),
      statsCols = Seq("k"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(5)).toDF("k"), Seq("k")) // v2
    // v3: a pruned keyed merge rewrites the one DV'd file (same span as
    // the deleted key) — the carried vector now points only at a dead
    // file
    SnapshotLog.upsert(spark, root, Seq((3, "V3")).toDF("k", "v"), Seq("k"))
    assert(SnapshotLog.tombDirsOf(spark, root, 3L).nonEmpty,
      "fixture drift: the merge should carry the (now stale) vector")
    val pre = rows(SnapshotLog.read(spark, root))
    assert(pre.size == 9 && pre.contains(3 -> "V3"))
    val v4 = SnapshotLog.purgeDeletedRows(spark, root)
    assert(v4 == 4L)
    assert(SnapshotLog.tombDirsOf(spark, root, v4).isEmpty)
    assert(!new java.io.File(root, "data_v00000004").exists(),
      "a stale-vector purge must be metadata-only")
    assert(SnapshotLog.dirsOf(spark, root, v4).toSet ==
      SnapshotLog.dirsOf(spark, root, 3L).toSet)
    assert(rows(SnapshotLog.read(spark, root)) == pre)
  }

  test("column-mapped lineage purges in physical space; reads keep translating") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 40).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(2, $"k"),
      statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "v", "label") // v2, metadata-only
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(3)).toDF("k"), Seq("k")) // v3
    val pre = SnapshotLog.read(spark, root)
    assert(pre.columns.toSeq == Seq("k", "label"))
    val preRows = rows(pre)
    assert(preRows.size == 39)
    val v4 = SnapshotLog.purgeDeletedRows(spark, root)
    assert(SnapshotLog.tombDirsOf(spark, root, v4).isEmpty)
    val post = SnapshotLog.read(spark, root)
    assert(post.columns.toSeq == Seq("k", "label"))
    assert(rows(post) == preRows)
    // the untouched file carried by reference (one of two was DV'd)
    assert(SnapshotLog.dirsOf(spark, root, v4)
      .exists(d => d.startsWith("data_v00000001/") && d.endsWith(".parquet")))
  }

  test("scoped purge rewrites only vector-referenced leafs; partitioning survives") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y3"), (4, "b", "y4"))
        .toDF("k", "p", "v"),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k")) // v1
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(2)).toDF("k"), Seq("k")) // v2
    val leafB = new java.io.File(root, "data_v00000001/__gp=b")
    val beforeB = fileState(leafB)
    assert(beforeB.nonEmpty)
    val pre = SnapshotLog.read(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(pre.size == 3 && !pre.exists(_._1 == 2))
    val v3 = SnapshotLog.purgeDeletedRows(spark, root)
    assert(v3 == 3L)
    assert(SnapshotLog.tombDirsOf(spark, root, v3).isEmpty)
    // leaf b untouched, carried by reference; leaf a rewritten under v3
    assert(fileState(leafB) == beforeB, "scoped purge touched a clean leaf")
    val dirs = SnapshotLog.dirsOf(spark, root, v3)
    assert(dirs.contains("data_v00000001/__gp=b"), dirs.toString)
    assert(dirs.exists(_.startsWith("data_v00000003/__gp=a")), dirs.toString)
    val post = SnapshotLog.read(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(post == pre)
    // dir-name partition pruning still live after the purge
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, v3, "p", "a", "a")
    assert(kept.nonEmpty && kept.size < total,
      s"purge dropped partition pruning: ${kept.size}/$total")
    // scoped upserts keep composing on the purged head
    SnapshotLog.upsertScoped(spark, root,
      Seq((9, "b", "y9")).toDF("k", "p", "v"), Seq("k"), "p")
    assert(SnapshotLog.read(spark, root).count() == 4)
  }

  test("all-rows-tombstoned file purges to an empty rewrite without drift") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.tombstoneDelete(spark, root,
      (1 to 10).map(Tuple1(_)).toDF("k"), Seq("k")) // v2: everything gone
    assert(SnapshotLog.read(spark, root).count() == 0)
    val v3 = SnapshotLog.purgeDeletedRows(spark, root)
    assert(SnapshotLog.tombDirsOf(spark, root, v3).isEmpty)
    assert(SnapshotLog.read(spark, root).count() == 0)
    // the table stays writable
    SnapshotLog.upsert(spark, root, Seq((1, "back")).toDF("k", "v"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "back"))
  }

  test("merge-on-read lineage refuses purge toward compactMor") {
    val root = freshRoot()
    SnapshotLog.createMorTable(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v").schema, Seq("k"))
    SnapshotLog.upsertMor(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(1)).toDF("k"), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.purgeDeletedRows(spark, root)
    }
    assert(e.getMessage.contains("compactMor"))
  }
}
