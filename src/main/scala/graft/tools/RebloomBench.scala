package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.SnapshotLog

/** Measured fact for the INCREMENTAL RE-BLOOM (round-11 verdict item
  * 5): build a flat chain of `nDirs` single-file commits with blooms
  * on an overlap-span key (min/max can never prune a point probe —
  * only blooms can), widen the key, append `wideDirs` post-widen
  * dirs, then compare the two ways back to bloom-powered point
  * lookups:
  *
  *   - `rebloomWidened` — rewrites ONLY the pre-widen narrow files;
  *   - `compactChain`   — rewrites the whole table.
  *
  * The rebloom cost tracks the NARROW backlog; the compaction cost
  * tracks the TABLE. As post-widen history grows (the common shape:
  * widen once, then keep appending for months), the gap widens toward
  * the table/backlog ratio. Also reports the point-probe file counts
  * before/after to show the blooms actually returned.
  * Run: `sbt "runMain graft.tools.RebloomBench [narrowDirs] [wideDirs] [rowsPerDir]"`.
  */
object RebloomBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val narrowDirs = args.headOption.map(_.toInt).getOrElse(4)
    val wideDirs = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val rows = args.drop(2).headOption.map(_.toInt).getOrElse(250000)
    val base = java.nio.file.Files.createTempDirectory("graft_rebloombench").toString

    // every dir spans [0, nDirs*rows) via interleaving (id ≡ d mod nDirs
    // over the whole range), so a point probe's span admits EVERY file
    def seed(d: Int, n: Int): org.apache.spark.sql.DataFrame =
      spark.range(rows.toLong).select(
        (col("id") * n + d).cast("int").as("id"),
        md5(col("id").cast("string")).as("v")).coalesce(1)

    def build(label: String): String = {
      val root = s"$base/$label"
      val total = narrowDirs + wideDirs
      (0 until narrowDirs).foreach(d =>
        SnapshotLog.appendCommit(spark, root, seed(d, total),
          statsCols = Seq("id"), bloomCols = Seq("id")))
      SnapshotLog.widenColumnType(spark, root, "id", LongType)
      (narrowDirs until total).foreach(d =>
        SnapshotLog.appendCommit(spark, root,
          seed(d, total).withColumn("id", col("id").cast("long")),
          statsCols = Seq("id"), bloomCols = Seq("id")))
      root
    }

    def probeFiles(root: String): Int =
      SnapshotLog.candidateFilesEquals(spark, root,
        SnapshotLog.currentVersion(spark, root).get, "id", 4242L)._1.size

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val rootA = build("rebloom")
    val rootB = build("compact")
    val total = narrowDirs + wideDirs
    val beforeA = probeFiles(rootA)
    val tRebloom = timed(SnapshotLog.rebloomWidened(spark, rootA))
    val afterA = probeFiles(rootA)
    val tCompact = timed(SnapshotLog.compactChain(spark, rootB,
      nFiles = total, bloomCols = Seq("id")))
    val afterB = probeFiles(rootB)
    println(f"[rebloombench] narrowDirs=$narrowDirs wideDirs=$wideDirs rowsPerDir=$rows")
    println(f"[rebloombench] point-probe files: pre=$beforeA/$total (blooms OFF under the widen mark)")
    println(f"[rebloombench] rebloomWidened ${tRebloom}%.2f s -> probe $afterA file(s)")
    println(f"[rebloombench] compactChain   ${tCompact}%.2f s -> probe $afterB file(s)")
    println(f"[rebloombench] speedup ${tCompact / tRebloom}%.1fx — rebloom tracks the narrow backlog, compaction the table")
    spark.stop()
  }
}
