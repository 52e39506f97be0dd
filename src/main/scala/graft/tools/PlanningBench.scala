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
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // checkpoint regime from the first commit — the 10⁶-file story IS
    // the parquet-sidecar story
    spark.conf.set("graft.stats.checkpointThresholdBytes", "0")

    def usedHeapMb(): Long = {
      val rt = Runtime.getRuntime
      System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
      (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    }

    scales.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory("graft_planbench")
        .toString + "/t"
      SnapshotLog.appendCommit(spark, root,
        (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
          .repartition(1),
        statsCols = Seq("k"))
      // a rename pins the schema in the manifest, so planning NEVER
      // opens a file footer — fake file paths are safe to plan over
      SnapshotLog.renameColumn(spark, root, "v", "w")
      val head = SnapshotLog.currentVersion(spark, root).get
      // synthesize N fake files into the HEAD's own checkpoint dir as
      // extra part files (the stack unions them with the real rows):
      // per file an `f` listing row, a disjoint `k` span, a z count
      val dirBase = f"data_v${1L}%08d"
      val fake = spark.range(1, n + 1L)
        .select(concat(lit(dirBase + "/part-fake-"), col("id"),
          lit(".parquet")).as("k0"), col("id"))
      // FOUR stats columns per file (the realistic shape — a table
      // tracks several skip columns): probes on `k` alone must leave
      // the other columns' rows on disk (the predicate-column filter)
      val statCols = Seq("k", "c2", "c3", "c4")
      val fakeRows = fake.select(col("k0").as("k"), lit("").as("c"),
          lit("f").as("t"), lit("1048576").as("a"), lit("0").as("b"))
        .unionAll(statCols.map(sc =>
          fake.select(col("k0").as("k"), lit(sc).as("c"),
            lit("n").as("t"),
            (col("id") * 1000L).cast("string").as("a"),
            (col("id") * 1000L + 999L).cast("string").as("b")))
          .reduce(_ unionAll _))
        .unionAll(statCols.map(sc =>
          fake.select(col("k0").as("k"), lit(sc).as("c"),
            lit("z").as("t"), lit("0").as("a"), lit("1000").as("b")))
          .reduce(_ unionAll _))
      val pqDir = SnapshotLog.statsPqPath(root, head)
      // mirror the real writer's (t, c) clustering (round 14): the
      // planning scans' pushed filters then skip whole row groups
      fakeRows.repartition(16).sortWithinPartitions("t", "c")
        .write.mode("append").parquet(pqDir.toString)

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
