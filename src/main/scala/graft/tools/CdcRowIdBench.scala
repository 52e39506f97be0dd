package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured facts for FILE-GRANULAR `changesByRowId` (round 13): a
  * 1-row keyed upsert on a many-file table should diff the predecessor
  * file against its rewrite — not two full-version scans. The baseline
  * is the round-12 shape, reconstructed from the public surface: a
  * full-outer join on `_row_id` between both versions' complete
  * `readWithRowIds` frames.
  *
  * Run: `sbt "runMain graft.tools.CdcRowIdBench [nDirs] [rowsPerDir]"`.
  */
object CdcRowIdBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDirs = args.headOption.map(_.toInt).getOrElse(32)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(300000)
    val base = java.nio.file.Files.createTempDirectory("graft_cdcbench").toString
    val root = s"$base/t"

    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("k").withColumn("v", md5(col("k").cast("string")))
      .coalesce(1)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    SnapshotLog.commit(spark, root, seed(0), statsCols = Seq("k"))
    (1 until nDirs).foreach(d =>
      SnapshotLog.appendCommit(spark, root, seed(d)))
    SnapshotLog.enableRowTracking(spark, root)
    val v1 = SnapshotLog.currentVersion(spark, root).get
    // the 1-row keyed upsert: span-pruned to one file's rewrite
    SnapshotLog.upsert(spark, root,
      Seq((5L * rows / 2, "UPDATED")).toDF("k", "v"), Seq("k"))
    val v2 = SnapshotLog.currentVersion(spark, root).get

    val (oldP, newP) = SnapshotLog.changedFileSlices(spark, root, v1, v2)
    val fg = (1 to 3).map(_ => time {
      assert(SnapshotLog.changesByRowId(spark, root, v1, v2).count() == 2)
    }).min
    // round-12 baseline: full-outer identity join of both FULL versions
    val full = (1 to 3).map(_ => time {
      val o = SnapshotLog.readWithRowIds(spark, root, Some(v1))
        .select(col("_row_id"), col("k"), col("v"))
      val n = SnapshotLog.readWithRowIds(spark, root, Some(v2))
        .select(col("_row_id").as("rid2"), col("k").as("k2"), col("v").as("v2"))
      val j = o.join(n, o("_row_id") === n("rid2"), "full_outer")
      assert(j.filter(col("_row_id").isNull || col("rid2").isNull ||
        !(col("v") <=> col("v2"))).count() == 1)
    }).min

    println(f"[cdcbench] dirs=$nDirs rowsPerDir=$rows " +
      f"(${nDirs.toLong * rows} rows)")
    println(f"[cdcbench] slice: ${oldP.size} old + ${newP.size} new files " +
      f"of ~$nDirs")
    println(f"[cdcbench] file-granular changesByRowId: $fg%.2f s")
    println(f"[cdcbench] full-version identity diff:   $full%.2f s " +
      f"(${full / fg}%.1fx)")
    spark.stop()
  }
}
