package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured fact for the FILE-GRANULAR keyed merge (round-10 verdict
  * item 1): grow two identical flat snapshot-log chains dir by dir
  * (disjoint key ranges, spans recorded), then drive N point MERGEs
  * (1-row updates) into each — one with the skipping stats present
  * (the pruned path rewrites the ONE matched file) and one with stats
  * suppressed (the classic path rewrites the whole snapshot every
  * time). The classic cost grows with the TABLE; the pruned cost
  * tracks the MATCHED FILE — at 100 TB the difference between a 1-row
  * MERGE costing ~one 128 MB file and costing the lake.
  * Run: `sbt "runMain graft.tools.MergeBench [nDirs] [rowsPerDir]"`.
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDirs = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val base = java.nio.file.Files.createTempDirectory("graft_mergebench").toString

    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("k").withColumn("v", md5(col("k").cast("string")))
      .coalesce(1)

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    def drive(label: String, statsCols: Seq[String]): Seq[Double] = {
      val root = s"$base/$label"
      (0 until nDirs).foreach(d =>
        SnapshotLog.appendCommit(spark, root, seed(d), statsCols = statsCols))
      (0 until 8).map { i =>
        val key = (i % nDirs).toLong * rows + 7 + i
        val batch = Seq((key, s"UPDATED$i")).toDF("k", "v")
        val t0 = System.nanoTime()
        SnapshotLog.upsert(spark, root, batch, Seq("k"),
          statsCols = statsCols)
        (System.nanoTime() - t0) / 1e9
      }
    }

    val pruned = drive("pruned", Seq("k"))
    val classic = drive("classic", Nil)
    println(f"[mergebench] dirs=$nDirs rowsPerDir=$rows")
    println(f"[mergebench] pruned  per-merge: median ${median(pruned)}%.3f s  (${pruned.map(t => f"$t%.2f").mkString(", ")})")
    println(f"[mergebench] classic per-merge: median ${median(classic)}%.3f s  (${classic.map(t => f"$t%.2f").mkString(", ")})")
    println(f"[mergebench] speedup ${median(classic) / median(pruned)}%.1fx — classic grows with the table, pruned with the matched file")
    spark.stop()
  }
}
