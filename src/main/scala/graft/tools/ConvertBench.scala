package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Measured facts for the round-12 surface:
  *
  *  1. CONVERT vs REWRITE — adopt a raw parquet directory in place
  *     (`convertParquet`, metadata + footer pass only) vs the only
  *     pre-round-12 route (read + full `commit` rewrite). The convert
  *     cost tracks FILE COUNT (footer metadata); the rewrite cost
  *     tracks DATA BYTES. At 100 TB the rewrite is a second copy of
  *     the lake; the convert is a listing.
  *
  *  2. META vs SCAN — `metaRowCount`/`metaMinMax` (one sidecar read)
  *     vs `count(*)`/`min/max` over the data. The meta answer is
  *     O(manifest) however large the table grows.
  *
  * Run: `sbt "runMain graft.tools.ConvertBench [files] [rowsPerFile]"`.
  */
object ConvertBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val files = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(500000)
    val base = java.nio.file.Files.createTempDirectory("graft_convbench").toString

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the raw dump: `files` parquet files of `rows` rows each
    val dump = s"$base/dump"
    (0 until files).foreach { i =>
      spark.range(i.toLong * rows, (i + 1L) * rows).select(
        col("id"), md5(col("id").cast("string")).as("v"))
        .coalesce(1).write.mode("append").parquet(dump)
    }
    val bytes = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dump))
    }
    println(f"dump: $files files, ${files.toLong * rows}%,d rows, ${bytes / 1e6}%.0f MB")

    // 1a. in-place convert (metadata + distributed footer pass)
    val (_, tConv) = timed(
      SnapshotLog.convertParquet(spark, dump, statsCols = Seq("id")))
    // 1b. the pre-round-12 route: read + full rewrite into a new table
    val rewrite = s"$base/rewrite"
    val (_, tRewrite) = timed(SnapshotLog.commit(spark, rewrite,
      spark.read.parquet(dump), statsCols = Seq("id")))
    println(f"convert (in place): $tConv%.2f s   full rewrite: $tRewrite%.2f s   " +
      f"ratio ${tRewrite / tConv}%.1fx")

    // 2. metadata answers vs data scans, on the converted table
    val (mc, tMeta) = timed(SnapshotLog.metaRowCount(spark, dump))
    val (sc, tScan) = timed(SnapshotLog.read(spark, dump).count())
    require(mc.contains(sc), s"meta count $mc != scan count $sc")
    val (mm, tMetaMm) = timed(SnapshotLog.metaMinMax(spark, dump, "id"))
    val (lo, tScanMm) = timed {
      val r = SnapshotLog.read(spark, dump)
        .agg(min(col("id")), max(col("id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(mm.contains((lo._1, lo._2)), s"meta minmax $mm != scan $lo")
    println(f"count(*): meta $tMeta%.3f s vs scan $tScan%.3f s (${tScan / tMeta}%.0fx)")
    println(f"min/max:  meta $tMetaMm%.3f s vs scan $tScanMm%.3f s (${tScanMm / tMetaMm}%.0fx)")
    spark.stop()
  }
}
