package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured fact for incremental append commits: drive N micro-batches
  * into two snapshot-log tables — one through the keyed-merge
  * `commitBatch` (full-snapshot rewrite per batch), one through
  * `appendBatch` (one delta dir per batch) — and report per-batch commit
  * times. The rewrite path's cost grows with the TABLE (it re-reads and
  * re-writes everything so far); the append path's cost tracks the
  * BATCH. Run: `sbt "runMain graft.tools.AppendBench [nBatches] [rows]"`.
  */
object AppendBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nBatches = args.headOption.map(_.toInt).getOrElse(12)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val base = java.nio.file.Files.createTempDirectory("graft_appendbench").toString

    def batch(i: Int) = spark.range(i.toLong * rows, (i + 1L) * rows)
      .toDF("event_id").withColumn("payload", md5(col("event_id").cast("string")))

    // early/late medians dodge both JIT warmup (first batches slow for
    // either mode) and single-batch jitter
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def drive(label: String, f: (org.apache.spark.sql.DataFrame, Int) => Unit): (Double, Double) = {
      val times = (0 until nBatches).map { i =>
        val b = batch(i)
        val t0 = System.nanoTime(); f(b, i); (System.nanoTime() - t0) / 1e9
      }
      val early = median(times.slice(2, 6))
      val late = median(times.takeRight(4))
      println(f"$label%-8s early-median=$early%.2fs late-median=$late%.2fs " +
        f"growth=${late / early}%.1fx  " + times.map(t => f"$t%.2f").mkString(" "))
      (early, late)
    }

    val (re, rl) = drive("rewrite", (b, i) =>
      SnapshotLog.commitBatch(spark, s"$base/rw", b, Seq("event_id"), i.toLong))
    val (ae, al) = drive("append", (b, i) =>
      SnapshotLog.appendBatch(spark, s"$base/ap", b, i.toLong))

    // same table contents either way
    val a = SnapshotLog.read(spark, s"$base/ap").count()
    val r = SnapshotLog.read(spark, s"$base/rw").count()
    require(a == r && a == nBatches.toLong * rows, s"row mismatch: $a vs $r")
    println(f"VERDICT over $nBatches batches the keyed-rewrite commit grew " +
      f"${rl / re}%.1fx while the append commit grew ${al / ae}%.1fx " +
      f"(late medians ${rl}%.2fs vs ${al}%.2fs)")
    spark.stop()
  }
}
