package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Manifest-log checkpointing (round 8 — VERDICT r7 #2): every N
  * commits the writer rolls the version→commit-time index into a
  * `v{N}.ckpt` + `_last_checkpoint` marker, so `versions()` / timestamp
  * time travel resolve through ONE checkpoint read plus an ≤ N-sized
  * tail of mtime stats — not one filesystem op per historical version.
  *
  * The O(tail) claim is asserted the hard way: with every manifest at
  * or below the checkpoint RENAMED AWAY, resolution must still answer
  * (and answer exactly) — any code path that touches sub-checkpoint
  * manifest files dies loudly instead. Time travel / restore / vacuum
  * exactness across the checkpoint boundary is then proven with the
  * manifests back in place.
  */
class CheckpointSpec extends SparkSpecBase {
  import spark.implicits._

  private def hfs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("index resolves O(tail) through the checkpoint; travel/restore/vacuum stay exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString + "/t"
    // 210 tiny commits at the default interval (25) → checkpoints roll
    // 25, 50, …, 200; the live tail past the last checkpoint is 201-210
    (1 to 210).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        Seq((i, s"r$i")).toDF("k", "v").coalesce(1))
    }
    val (cv, entries) = SnapshotLog.checkpointEntries(spark, root).get
    assert(cv == 200L, s"expected checkpoint at 200, got $cv")
    assert(entries.map(_._1) == (1L to 200L))
    assert(SnapshotLog.versions(spark, root) == (1L to 210L))

    // record ground truth BEFORE hiding history
    val t100 = SnapshotLog.commitTimes(spark, root).toMap.apply(100L)
    val rows100 = SnapshotLog.readVersion(spark, root, 100L).count()
    assert(rows100 == 100L)

    // --- the O(tail) proof: hide every manifest ≤ checkpoint; index
    //     resolution must neither miss them (checkpoint-authoritative)
    //     nor touch them (the files are gone)
    val ld = new Path(root, "_graft_log")
    val f = hfs(ld)
    val hidden = (1L to 200L).map(v => new Path(ld, f"v$v%08d.manifest"))
    hidden.foreach(m => assert(f.rename(m, new Path(ld, m.getName + ".bak"))))
    assert(SnapshotLog.versions(spark, root) == (1L to 210L),
      "versions() below the checkpoint must come from the checkpoint index")
    assert(SnapshotLog.versionAsOf(spark, root, t100).contains(100L),
      "timestamp resolution below the checkpoint must use recorded times")
    assert(SnapshotLog.versionAsOf(spark, root,
      java.time.Instant.now()).contains(210L))
    assert(SnapshotLog.read(spark, root).count() == 210L,
      "head reads never needed historical manifests")
    hidden.foreach(m =>
      assert(f.rename(new Path(ld, m.getName + ".bak"), m)))

    // --- exactness across the boundary: travel to and restore a
    //     sub-checkpoint version
    assert(SnapshotLog.readAsOf(spark, root, t100).count() == 100L)
    val restored = SnapshotLog.restore(spark, root, 100L)
    assert(restored == 211L)
    assert(SnapshotLog.read(spark, root).count() == 100L)
    assert(SnapshotLog.read(spark, root).agg(max($"k")).as[Int].head() == 100)

    // --- vacuum rewrites the checkpoint to the survivors (checkpoint-
    //     first ordering), and resolution agrees afterwards
    SnapshotLog.vacuum(spark, root, keep = 3)
    val vs = SnapshotLog.versions(spark, root)
    assert(vs == Seq(209L, 210L, 211L), s"got $vs")
    val (cv2, entries2) = SnapshotLog.checkpointEntries(spark, root).get
    assert(cv2 == 211L && entries2.map(_._1) == Seq(209L, 210L, 211L))
    // exactly one checkpoint file remains (superseded ones reclaimed)
    assert(f.listStatus(ld).map(_.getPath.getName).count(_.endsWith(".ckpt")) == 1)
    assert(SnapshotLog.versionAsOf(spark, root,
      java.time.Instant.now()).contains(211L))
    assert(SnapshotLog.read(spark, root).count() == 100L)
    // restored head still reads sub-checkpoint DATA dirs (refcounted,
    // not vacuumed away with their manifests)
    assert(SnapshotLog.readVersion(spark, root, 211L)
      .agg(max($"k")).as[Int].head() == 100)
  }

  test("checkpointing is an accelerator, not a format change: disabled tables interop") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt0").toString + "/t"
    spark.conf.set("spark.graft.log.checkpoint.interval", "0")
    try {
      (1 to 30).foreach { i =>
        SnapshotLog.appendCommit(spark, root,
          Seq((i, i)).toDF("k", "v").coalesce(1))
      }
      assert(SnapshotLog.checkpointEntries(spark, root).isEmpty)
      assert(SnapshotLog.versions(spark, root) == (1L to 30L)) // legacy listing
    } finally spark.conf.unset("spark.graft.log.checkpoint.interval")
    // re-enabling picks the table up mid-history on the next commit
    spark.conf.set("spark.graft.log.checkpoint.interval", "25")
    try {
      SnapshotLog.appendCommit(spark, root, Seq((31, 31)).toDF("k", "v").coalesce(1))
      val (cv, entries) = SnapshotLog.checkpointEntries(spark, root).get
      assert(cv == 31L && entries.map(_._1) == (1L to 31L))
    } finally spark.conf.unset("spark.graft.log.checkpoint.interval")
  }
}
