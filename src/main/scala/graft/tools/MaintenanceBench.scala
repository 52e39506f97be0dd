// Write/maintenance-side scale proof for the round-14 verdict's #2: the
// READ side (planning) was proven sub-linear at 10⁶ manifest files in
// round 14; this measures the MUTATING verbs over the same table shape —
//   1. appendCommit metadata cost on a 10⁶-file table (must be O(batch):
//      the stats carry CHAINS, it never rewrites the parent checkpoint);
//   2. checkpoint-chain consolidation at depth 20 (the one deliberate
//      O(files) write — Delta's checkpoint-every-N — measured where it
//      fires, inside a 25-append chain at default depth);
//   3. compactSmallFiles' DECISION listing on a 10⁶-file manifest (the
//      metadata read that sizes every dir before deciding nothing is
//      small — a no-op pack must still pay it);
//   4. the vacuum walk after the chain (manifest-granular: reference-
//      counting across ~27 retained/dropped versions; data deletes in
//      this fixture are O(versions) small dirs, so the number isolates
//      the WALK, not disk throughput).
// Run: sbt "runMain graft.tools.MaintenanceBench [n1 n2 ...]"  (default
// 10000 100000 1000000).
package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.SnapshotLog

object MaintenanceBench {
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
    spark.conf.set("graft.stats.checkpointThresholdBytes", "0")

    scales.foreach { n =>
      val root = PlanFixture.build(spark, n)
      val heap0 = PlanFixture.usedHeapMb()

      def timed[T](body: => T): (Double, T) = {
        val t0 = System.nanoTime()
        val r = body
        ((System.nanoTime() - t0) / 1e6, r)
      }

      // 25 appends of a 100-row batch: the chain starts at the fixture
      // head (depth 2) and consolidates once when 1 + stack ≥ 20 — every
      // other append must cost O(batch) regardless of n
      val appendTimes = (1 to 25).map { i =>
        val batch = (1 to 100).map(j => ((i * 1000 + j).toLong, s"a$i-$j"))
          .toDF("k", "w").repartition(1)
        timed(SnapshotLog.appendCommit(spark, root, batch,
          statsCols = Seq("k")))._1
      }
      val consolidationMs = appendTimes.max
      val chainedMs = appendTimes.sorted.take(20).sum / 20 // trimmed mean
      val heapAppend = PlanFixture.usedHeapMb()

      // compactSmallFiles decision on the full manifest: every fake file
      // reports 1 MiB, so targetBytes=1 packs nothing — the cost IS the
      // O(files) sizing decision. The REPEAT decision serves its listing
      // from the planning-state cache (round 15: filesFromSidecar routes
      // through planInputs), so only the first pays the collect
      val (decisionMs, headAfter) =
        timed(SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L))
      val (decision2Ms, _) =
        timed(SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L))
      val heapDecision = PlanFixture.usedHeapMb()

      // vacuum the chain down to 2 versions: the walk reference-counts
      // dirs/tombs/stats stacks across every retained version and
      // deletes the dropped versions' manifests + owned dirs
      val versionsBefore = SnapshotLog.versions(spark, root).size
      val (vacuumMs, _) = timed(SnapshotLog.vacuum(spark, root, keep = 2))
      val heapEnd = PlanFixture.usedHeapMb()

      println(f"[maint] files=${n + 1}%d | append ms: chained(mean20)=" +
        f"$chainedMs%.0f consolidation(max)=$consolidationMs%.0f | " +
        f"compact-decision ms=$decisionMs%.0f repeat=$decision2Ms%.0f " +
        f"(noop=head:${headAfter}%d) | " +
        f"vacuum ms=$vacuumMs%.0f (versions $versionsBefore→2) | " +
        f"heap MB base=$heap0%d app=$heapAppend%d dec=$heapDecision%d " +
        f"end=$heapEnd%d")
    }
    spark.stop()
  }
}
