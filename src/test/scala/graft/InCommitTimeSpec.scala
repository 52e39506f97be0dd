package graft

import java.nio.file.Files
import graft.sources.SnapshotLog

/** In-commit timestamps (round 12 — Delta's inCommitTimestamp): the
  * writer stamps commit wall time INSIDE the manifest, clamped strictly
  * above the parent's stamp. Contract under test: time travel survives
  * mtime loss (backup/restore, store copies); stamps are strictly
  * monotonic even for same-millisecond commits; pre-stamp manifests
  * fall back to file mtime.
  */
class InCommitTimeSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ict").toString + "/table"

  private def manifestFile(root: String, v: Long): java.io.File =
    new java.io.File(root, f"_graft_log/v$v%08d.manifest")

  test("commit time is the writer's stamp, not file mtime — survives a re-dated copy") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))
    val t1 = SnapshotLog.commitTimeOf(spark, root, 1L)
    SnapshotLog.commit(spark, root, Seq((2, "b")).toDF("k", "v"))
    val t2 = SnapshotLog.commitTimeOf(spark, root, 2L)
    // the manifest carries the stamp
    val text = new String(java.nio.file.Files.readAllBytes(
      manifestFile(root, 1L).toPath))
    assert(text.contains("\"committedAt\":" + t1.toEpochMilli), text)
    // simulate a backup/restore that resets every mtime far in the
    // future: commit times (and therefore versionAsOf) must not move
    val future = System.currentTimeMillis() + 86400000L
    Seq(1L, 2L).foreach(v => assert(manifestFile(root, v).setLastModified(future)))
    assert(SnapshotLog.commitTimeOf(spark, root, 1L) == t1)
    assert(SnapshotLog.commitTimeOf(spark, root, 2L) == t2)
    assert(SnapshotLog.versionAsOf(spark, root, t1) == Some(1L))
    assert(SnapshotLog.versionAsOf(spark, root, t2) == Some(2L))
    assert(SnapshotLog.versionAsOf(spark, root,
      t1.minusMillis(1L)).isEmpty)
  }

  test("stamps are strictly monotonic across rapid commits and mixed kinds") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.upsert(spark, root, Seq((3, "V3")).toDF("k", "v"), Seq("k"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(5)).toDF("k"), Seq("k"))
    SnapshotLog.restore(spark, root, 1L)
    val times = SnapshotLog.commitTimes(spark, root)
    assert(times.map(_._1) == Seq(1L, 2L, 3L, 4L))
    times.sliding(2).foreach { case Seq((va, ta), (vb, tb)) =>
      assert(ta.isBefore(tb),
        s"v$va=$ta not strictly before v$vb=$tb")
    }
    // readAsOf at the delete's stamp sees the delete, one ms earlier
    // sees the pre-delete snapshot
    val tDel = times.find(_._1 == 3L).get._2
    assert(SnapshotLog.readAsOf(spark, root, tDel).count() == 9)
    assert(SnapshotLog.readAsOf(spark, root, tDel.minusMillis(1L)).count() == 10)
  }

  test("pre-stamp manifests fall back to file mtime (legacy tables stay readable)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))
    // strip the stamp to simulate a manifest written before round 12
    val mf = manifestFile(root, 1L)
    val text = new String(java.nio.file.Files.readAllBytes(mf.toPath))
    val legacy = text.replaceAll("\"committedAt\":\\d+,", "")
    assert(legacy != text)
    java.nio.file.Files.write(mf.toPath, legacy.getBytes)
    // the local Hadoop FS keeps a .crc sidecar; the raw rewrite above
    // invalidates it (a real legacy manifest has a matching one)
    new java.io.File(mf.getParent, "." + mf.getName + ".crc").delete()
    val stamp = 1700000000000L // fixed past instant
    assert(mf.setLastModified(stamp))
    assert(SnapshotLog.commitTimeOf(spark, root, 1L).toEpochMilli == stamp)
    // and the NEXT commit still stamps (clamped above the mtime-derived
    // parent? no — above the parent's absent stamp means wall clock)
    SnapshotLog.commit(spark, root, Seq((2, "b")).toDF("k", "v"))
    val t2 = SnapshotLog.commitTimeOf(spark, root, 2L)
    assert(t2.toEpochMilli > stamp)
  }
}
