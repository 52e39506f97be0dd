package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured facts for the MERGE-ON-READ rung of the keyed-upsert
  * ladder (round 11c):
  *
  *  1. WRITE cost vs table size: seed two tables dir by dir, then
  *     drive N 1-row keyed upserts into each — the file-granular
  *     `upsert` (stats present, rewrites the matched file) vs
  *     `upsertMor` (always O(batch)). The pruned merge tracks the
  *     matched FILE (~128 MB at production sizes); upsertMor tracks
  *     the BATCH (one row here) — at 100 TB the difference between a
  *     point update costing one file and costing one row.
  *  2. READ cost vs chain depth: resolution (WindowGroupLimit) over a
  *     deep shadow chain, before and after `compactMor` — the number
  *     that says how often a streaming sink should auto-compact.
  *
  * Run: `sbt "runMain graft.tools.MorBench [nDirs] [rowsPerDir]"`.
  */
object MorBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDirs = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(250000)
    val base = java.nio.file.Files.createTempDirectory("graft_morbench").toString

    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("k").withColumn("v", md5(col("k").cast("string")))
      .coalesce(1)

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // ---- 1. point-update write cost: pruned file rewrite vs MoR delta
    val upRoot = s"$base/upsert"
    (0 until nDirs).foreach(d =>
      SnapshotLog.appendCommit(spark, upRoot, seed(d), statsCols = Seq("k")))
    val prunedT = (0 until 8).map { i =>
      val key = (i % nDirs).toLong * rows + 7 + i
      time(SnapshotLog.upsert(spark, upRoot,
        Seq((key, s"U$i")).toDF("k", "v"), Seq("k"), statsCols = Seq("k")))
    }
    val morRoot = s"$base/mor"
    SnapshotLog.upsertMor(spark, morRoot, seed(0), Seq("k"),
      statsCols = Seq("k"))
    (1 until nDirs).foreach(d =>
      SnapshotLog.upsertMor(spark, morRoot, seed(d), Seq("k"),
        statsCols = Seq("k")))
    val morT = (0 until 8).map { i =>
      val key = (i % nDirs).toLong * rows + 7 + i
      time(SnapshotLog.upsertMor(spark, morRoot,
        Seq((key, s"U$i")).toDF("k", "v"), Seq("k"), statsCols = Seq("k")))
    }

    // ---- 2. read cost vs chain depth (the chain now has nDirs + 8 dirs)
    val deepRead = (0 until 3).map(_ =>
      time(SnapshotLog.read(spark, morRoot).agg(count(lit(1))).collect()))
    val cT = time(SnapshotLog.compactMor(spark, morRoot, nFiles = 16))
    val flatRead = (0 until 3).map(_ =>
      time(SnapshotLog.read(spark, morRoot).agg(count(lit(1))).collect()))

    println(f"[morbench] dirs=$nDirs rowsPerDir=$rows")
    println(f"[morbench] point-update pruned upsert: median ${median(prunedT)}%.3f s  (${prunedT.map(t => f"$t%.2f").mkString(", ")})")
    println(f"[morbench] point-update upsertMor:     median ${median(morT)}%.3f s  (${morT.map(t => f"$t%.2f").mkString(", ")})")
    println(f"[morbench] write speedup ${median(prunedT) / median(morT)}%.1fx — the pruned merge reads+rewrites the matched file, MoR writes the batch")
    println(f"[morbench] read, ${nDirs + 8} shadow dirs: median ${median(deepRead)}%.3f s; after compactMor (${cT}%.1f s): ${median(flatRead)}%.3f s")
    spark.stop()
  }
}
