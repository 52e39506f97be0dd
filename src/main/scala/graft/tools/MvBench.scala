package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{IncrementalView, SnapshotLog}

/** Measured fact for incremental MV maintenance (round 7b): load the
  * sf0.1 events table into a snapshot log, bootstrap a per-event-type
  * (count, sum(value)) view, then drive N small append batches. After
  * each batch, bring the view current two ways and time them:
  *
  *   refresh   — IncrementalView.refresh: O(batch deltas) + a merge on
  *               the |event_type|-row view
  *   recompute — full re-aggregate of the whole source + replaceBatch
  *
  * The recompute path's cost grows with the TABLE; refresh tracks the
  * BATCH. At sf0.1 (100k events) the gap is already visible; at 100 TB
  * it is the difference between a nightly delta apply and a nightly
  * full scan. Run: `sbt "runMain graft.tools.MvBench [nBatches] [batchRows]"`.
  */
object MvBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val batchRows = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    // the asymmetry under test is O(batch) vs O(table): the base table
    // must dwarf the batch, or per-job constants drown the signal (at
    // the raw sf0.1 size, 100k rows, recompute even WINS — measured).
    // 5M rows ≈ 50× sf0.1 keeps the run under a minute while making the
    // table term clearly visible.
    val baseRows = args.drop(2).headOption.map(_.toLong).getOrElse(5000000L)
    val base = java.nio.file.Files.createTempDirectory("graft_mvbench").toString
    val srcA = s"$base/srcA"; val viewA = s"$base/viewA" // refresh path
    val srcB = s"$base/srcB"; val viewB = s"$base/viewB" // recompute path

    val events = graft.engine.Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "event_type", "value")
      .unionByName(spark.range(baseRows).toDF("event_id")
        .withColumn("event_id", col("event_id") + 2000000L)
        .withColumn("event_type", concat(lit("type_"), pmod(col("event_id"), lit(7))))
        .withColumn("value", pmod(col("event_id"), lit(997)).cast("double")))
    SnapshotLog.commit(spark, srcA, events)
    SnapshotLog.commit(spark, srcB, events)
    IncrementalView.refresh(spark, srcA, viewA, Seq("event_id"), Seq("event_type"), "value")
    IncrementalView.refresh(spark, srcB, viewB, Seq("event_id"), Seq("event_type"), "value")

    def batch(i: Int) = spark.range(1000000L + i.toLong * batchRows,
                                    1000000L + (i + 1L) * batchRows)
      .toDF("event_id")
      .withColumn("event_type", concat(lit("type_"), pmod(col("event_id"), lit(7))))
      .withColumn("value", pmod(col("event_id"), lit(997)).cast("double"))

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (tR, tF) = (0 until nBatches).map { i =>
      val b = batch(i)
      SnapshotLog.appendCommit(spark, srcA, b)
      SnapshotLog.appendCommit(spark, srcB, b)
      val t0 = System.nanoTime()
      IncrementalView.refresh(spark, srcA, viewA, Seq("event_id"), Seq("event_type"), "value")
      val t1 = System.nanoTime()
      val full = IncrementalView.aggregate(
        SnapshotLog.read(spark, srcB), Seq("event_type"), "value")
      SnapshotLog.replaceBatch(spark, viewB, full,
        batchId = SnapshotLog.currentVersion(spark, srcB).get)
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }.unzip
    // sanity: the two views agree exactly
    val a = SnapshotLog.read(spark, viewA).orderBy("event_type").collect().toSeq
    val bb = SnapshotLog.read(spark, viewB).orderBy("event_type").collect().toSeq
    require(a == bb, s"refresh and recompute views diverged:\n$a\n$bb")
    println(f"[mvbench] batches=$nBatches rows/batch=$batchRows " +
      f"refresh_med=${median(tR)}%.3fs recompute_med=${median(tF)}%.3fs " +
      f"ratio=${median(tF) / median(tR)}%.2fx (views identical)")
    spark.stop()
  }
}
