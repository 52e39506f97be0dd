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
