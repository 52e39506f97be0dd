// Planning-scale proof for the round-13 verdict's #1: does readPruned
// PLANNING stay bounded at ~1M manifest files? Synthesizes a snapshot-log
// table whose parquet stats checkpoint lists N fictitious files (3 rows
// per file: listing, span, null-count — the real writer's shape), then
// measures the full planning path — listingLines collect, filesFromLines
// manifest build, SkippingFileIndex.listFiles with the distributed
// checkpoint prune — via FileSourceScanExec.selectedPartitions, plus
// driver-heap growth. Fake files are never READ (planning only), so the
// synthesis is O(checkpoint rows) and the numbers isolate metadata cost.
// Run: sbt "runMain graft.tools.PlanningBench [n1 n2 ...]"  (default
// 10000 100000 1000000).
package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

object PlanningBench {
  def main(args: Array[String]): Unit = {
    val scales =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10000, 100000, 1000000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      // driver heap comes from build.sbt's forked -Xmx (SPARK_DRIVER_MEM,
      // default 8g) -- a builder config cannot resize a running JVM
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // checkpoint regime from the first commit — the 10⁶-file story IS
    // the parquet-sidecar story
    spark.conf.set("graft.stats.checkpointThresholdBytes", "0")

    def usedHeapMb(): Long = PlanFixture.usedHeapMb()

    scales.foreach { n =>
      // synthesis extracted to PlanFixture (round 15 — MaintenanceBench
      // measures the WRITE verbs over the same table shape)
      val root = PlanFixture.build(spark, n)

      val heap0 = usedHeapMb()
      def planForced(pred: org.apache.spark.sql.Column): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = SnapshotLog.readPruned(spark, root).filter(pred)
        val scan = df.queryExecution.sparkPlan.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.getOrElse(sys.error("no FileSourceScanExec in plan"))
        val kept = scan.selectedPartitions.totalNumberOfFiles
        (((System.nanoTime() - t0) / 1e6), kept)
      }
      // selective point probe: hits exactly ONE fake file's span — the
      // kept side must ship to the driver (O(result), not O(files))
      val probe = math.min(n.toLong / 2, n.toLong - 1).max(1) * 1000L + 500L
      val (tSel, keptSel) = planForced(col("k") === probe)
      val selMode = SnapshotLog.lastPlanPrune
      // repeat query at the SAME version: the planning-state cache
      // serves the listing; only the verdict job re-runs
      val (tSel2, _) = planForced(col("k") === probe)
      val heapSel = usedHeapMb()
      // broad probe: admits everything — the PRUNED side (empty) ships
      val (tBroad, keptBroad) = planForced(col("k") >= 0L)
      val broadMode = SnapshotLog.lastPlanPrune
      val heapEnd = usedHeapMb()
      println(f"[planning] files=${n + 1}%d | selective: ${tSel}%.0f ms " +
        f"(repeat ${tSel2}%.0f ms cached), kept=$keptSel%d, mode=$selMode " +
        f"| broad: ${tBroad}%.0f ms, kept=$keptBroad%d, mode=$broadMode " +
        f"| heap MB base=$heap0%d afterSel=$heapSel%d end=$heapEnd%d")
    }
    spark.stop()
  }
}
