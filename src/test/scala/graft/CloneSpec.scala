package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Shallow clone (round 8): zero-copy table snapshot by manifest
  * reference. The spec proves the isolation contract on BYTES, not just
  * rows — the clone's appends, merge-on-read updates, and vacuum must
  * leave every source file untouched — plus stats carry-over and the
  * streaming tail starting from a clone's non-1 first version.
  */
class CloneSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_clone_$tag").toString + "/t"

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("clone: read equality, independent evolution, vacuum never touches the source") {
    val src = freshRoot("src")
    val dst = freshRoot("dst")
    SnapshotLog.commit(spark, src,
      (1 to 50).map(i => (i, s"v$i")).toDF("k", "v").repartition(2),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, src,
      (51 to 60).map(i => (i, s"v$i")).toDF("k", "v"), statsCols = Seq("k"))

    val v = SnapshotLog.shallowClone(spark, src, dst)
    assert(v == 2L, "clone publishes at the source's version number")
    assert(rows(SnapshotLog.read(spark, dst)) == rows(SnapshotLog.read(spark, src)))
    val srcBytes = fileState(src)
    assert(srcBytes.nonEmpty)

    // carried stats prune on the clone immediately (k ≤ 50 lives in the
    // first commit's files only)
    val (kept, total) = SnapshotLog.candidateFiles(spark, dst, v, "k", 55, 58)
    assert(kept.size < total, s"carried stats did not prune: ${kept.size} of $total")

    // the clone evolves: append + merge-on-read update + delete
    SnapshotLog.appendCommit(spark, dst, Seq((100, "extra")).toDF("k", "v"))
    SnapshotLog.updateWhere(spark, dst,
      base => base("k") === 1, Map("v" -> lit("CLONED")))
    SnapshotLog.tombstoneDelete(spark, dst, Seq(2).toDF("k"), Seq("k"))
    val got = rows(SnapshotLog.read(spark, dst))
    assert(got.contains(1 -> "CLONED") && got.contains(100 -> "extra"))
    assert(!got.exists(_._1 == 2) && got.size == 60)
    // ...while the source is untouched, by rows AND by bytes
    assert(rows(SnapshotLog.read(spark, src))
      == (1 to 60).map(i => (i, s"v$i")).toSet)
    assert(fileState(src) == srcBytes,
      "clone operations must never rewrite source files")

    // vacuum on the clone reclaims only clone-owned dirs
    SnapshotLog.vacuum(spark, dst, 1)
    assert(fileState(src) == srcBytes, "clone vacuum reached into the source")
    assert(rows(SnapshotLog.read(spark, dst)) == got,
      "clone must stay readable after its own vacuum")
  }

  test("clone pins (round 11): source vacuum keeps the referenced dirs; release on materialize/drop") {
    val src = freshRoot("pin_src")
    val dst = freshRoot("pin_dst")
    // three versions; the clone references v1 — an aggressive source
    // vacuum would have reclaimed v1's dirs before round 11
    SnapshotLog.commit(spark, src,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.commit(spark, src,
      (1 to 10).map(i => (i, s"w$i")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst, version = Some(1L))
    // the pin is registered AND enumerable, at the referenced version
    val pins = SnapshotLog.clonePins(spark, src)
    assert(pins.values.toSeq == Seq(1L), pins.toString)
    // dry-run shows v1 SURVIVES the keep=1 vacuum (pin widens keep)
    assert(SnapshotLog.vacuumDryRun(spark, src, 1).isEmpty)
    SnapshotLog.commit(spark, src,
      (1 to 10).map(i => (i, s"x$i")).toDF("k", "v"))
    SnapshotLog.vacuum(spark, src, 1)
    // v1 (and its dirs) survive; the clone keeps reading
    assert(SnapshotLog.versions(spark, src).contains(1L))
    assert(rows(SnapshotLog.read(spark, dst)) ==
      (1 to 10).map(i => (i, s"v$i")).toSet)
    // the clone MATERIALIZES → pin releases → source vacuum narrows
    SnapshotLog.compactChain(spark, dst)
    assert(SnapshotLog.clonePins(spark, src).isEmpty,
      "compactChain must release the clone's source pin")
    SnapshotLog.vacuum(spark, src, 1)
    assert(SnapshotLog.versions(spark, src) == Seq(3L))
    assert(rows(SnapshotLog.read(spark, dst)) ==
      (1 to 10).map(i => (i, s"v$i")).toSet,
      "materialized clone must survive the source vacuum")
    // a DROPPED clone releases too
    val dst2 = freshRoot("pin_dst2")
    SnapshotLog.shallowClone(spark, src, dst2)
    assert(SnapshotLog.clonePins(spark, src).size == 1)
    SnapshotLog.releaseClonePin(spark, dst2)
    assert(SnapshotLog.clonePins(spark, src).isEmpty)
    // releasing twice is a no-op; a non-clone table releases nothing
    SnapshotLog.releaseClonePin(spark, dst2)
    SnapshotLog.releaseClonePin(spark, src)
    // a FAILED re-clone onto an occupied destination must not corrupt
    // the existing clone's pin record or leak a pin on the new source
    val dst3 = freshRoot("pin_dst3")
    SnapshotLog.shallowClone(spark, src, dst3)
    val pinsBefore = SnapshotLog.clonePins(spark, src)
    val src2 = freshRoot("pin_src2")
    SnapshotLog.commit(spark, src2, (1 to 3).map(i => (i, s"s$i")).toDF("k", "v"))
    intercept[Exception] { SnapshotLog.shallowClone(spark, src2, dst3) }
    assert(SnapshotLog.clonePins(spark, src) == pinsBefore,
      "failed re-clone corrupted the existing pin record")
    assert(SnapshotLog.clonePins(spark, src2).isEmpty,
      "failed re-clone leaked a pin on the new source")
    // and the ORIGINAL pin still releases through the clone's record
    SnapshotLog.releaseClonePin(spark, dst3)
    assert(SnapshotLog.clonePins(spark, src).isEmpty)
  }

  test("the streaming tail starts from a clone's non-1 first version") {
    val src = freshRoot("tsrc")
    val dst = freshRoot("tdst")
    SnapshotLog.commit(spark, src, Seq((1, "a")).toDF("k", "v"))
    SnapshotLog.appendCommit(spark, src, Seq((2, "b")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst) // clone head = version 2
    val ck = Files.createTempDirectory("graft_clone_ck").toString
    val q = spark.readStream.format("graft").load(dst)
      .writeStream.format("memory").queryName("clone_tail_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("clone_tail_sink").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet == Set(1 -> "a", 2 -> "b"))
      // appends to the CLONE flow through the tail
      SnapshotLog.appendCommit(spark, dst, Seq((3, "c")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("clone_tail_sink").count() == 3)
    } finally q.stop()
  }
}
