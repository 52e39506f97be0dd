package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Measured facts for the round-9 PARQUET STATS CHECKPOINT: build the
  * same append chain twice — text sidecars (driver-built, the pre-9
  * path) vs checkpoint storage (threshold 0, distributed) — and compare
  * (a) total commit wall time, (b) head-sidecar size on disk, (c) probe
  * latency (`candidateFiles`) and (d) a filtered `readPruned` count.
  * The local-disk timing UNDERSTATES the checkpoint's win: the text
  * path's real wall is DRIVER HEAP — every carried line materializes
  * twice per commit (carry + sorted fresh) and the head write is one
  * contiguous string, which at 10⁶ files × columns is multi-GB on a
  * single thread; the checkpoint bounds driver work at O(batch).
  * Run: `sbt "runMain graft.tools.StatsCheckpointBench [commits] [filesPerCommit]"`.
  */
object StatsCheckpointBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val commits = args.headOption.map(_.toInt).getOrElse(20)
    val perCommit = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    // optional third arg: run ONE leg in a fresh JVM (text|full|chain) —
    // the three-leg run shares a session, and session aging inflates
    // whichever leg runs last; single-leg runs give clean comparisons
    val mode = args.drop(2).headOption.getOrElse("all")
    if (mode != "all") {
      val root = java.nio.file.Files.createTempDirectory(s"graft_scb_$mode")
        .toString + "/t"
      mode match {
        case "text" => spark.conf.set("graft.stats.checkpointThresholdBytes",
          Long.MaxValue.toString)
        case "full" =>
          spark.conf.set("graft.stats.checkpointThresholdBytes", "0")
          spark.conf.set("graft.stats.checkpointChainDepth", "1")
        case "chain" =>
          spark.conf.set("graft.stats.checkpointThresholdBytes", "0")
        case other => sys.error(s"unknown mode $other")
      }
      val t = buildChain(root)
      val (pb, kept, tot) = probe(root)
      println(f"$mode: commit total $t%.2f s | probe $pb%.3f s kept=$kept/$tot")
      spark.stop()
      return
    }

    def buildChain(root: String): Double = {
      val t0 = System.nanoTime()
      (0 until commits).foreach { i =>
        SnapshotLog.appendCommit(spark, root,
          spark.range(perCommit.toLong).select(
            (col("id") + i.toLong * perCommit).as("k"),
            (col("id") % 13).as("v"))
            .repartitionByRange(perCommit, col("k")),
          statsCols = Seq("k", "v"))
      }
      (System.nanoTime() - t0) / 1e9
    }
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(sizeOf).sum
      else f.length()
    def probe(root: String): (Double, Int, Int) = {
      val head = SnapshotLog.currentVersion(spark, root).get
      var best = Double.MaxValue; var kept = 0; var tot = 0
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        val (k, t) = SnapshotLog.candidateFiles(spark, root, head, "k",
          perCommit.toLong * 2, perCommit.toLong * 3 - 1)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        kept = k.size; tot = t
      }
      (best, kept, tot)
    }

    val rootT = java.nio.file.Files.createTempDirectory("graft_scb_t").toString + "/t"
    val rootP = java.nio.file.Files.createTempDirectory("graft_scb_p").toString + "/t"
    val rootC = java.nio.file.Files.createTempDirectory("graft_scb_c").toString + "/t"
    // pin the threshold unreachably high for the text baseline — the
    // default 4 MB would auto-migrate the chain mid-run (the feature
    // working, but not the comparison we want to time)
    spark.conf.set("graft.stats.checkpointThresholdBytes", Long.MaxValue.toString)
    val tText = buildChain(rootT)
    spark.conf.set("graft.stats.checkpointThresholdBytes", "0")
    // full checkpoint every commit (chain depth 1 = consolidate always)
    spark.conf.set("graft.stats.checkpointChainDepth", "1")
    val tPq = buildChain(rootP)
    // chained deltas (default depth): each append writes its own rows only
    spark.conf.unset("graft.stats.checkpointChainDepth")
    val tChain = buildChain(rootC)
    spark.conf.unset("graft.stats.checkpointThresholdBytes")

    val headV = SnapshotLog.currentVersion(spark, rootT).get
    val textBytes = sizeOf(new java.io.File(
      f"$rootT/_graft_log/v$headV%08d.stats"))
    val pqBytes = sizeOf(new java.io.File(
      f"$rootP/_graft_log/v$headV%08d.statspq"))
    val deltaBytes = sizeOf(new java.io.File(
      f"$rootC/_graft_log/v$headV%08d.statspq"))
    val (pt, keptT, totT) = probe(rootT)
    val (pp, keptP, totP) = probe(rootP)
    val (pc, keptC, totC) = probe(rootC)
    println(f"chain: $commits commits x $perCommit files, statsCols=2")
    println(f"commit total: text $tText%.2f s | full-ckpt $tPq%.2f s | chained $tChain%.2f s")
    println(f"head sidecar: text $textBytes B | full-ckpt $pqBytes B | head delta $deltaBytes B")
    println(f"probe (min of 5): text $pt%.3f s kept=$keptT/$totT | " +
      f"full-ckpt $pp%.3f s kept=$keptP/$totP | chained $pc%.3f s kept=$keptC/$totC")
    require(keptT == keptP && totT == totP, "pruning parity broke (full)")
    require(keptT == keptC && totT == totC, "pruning parity broke (chained)")
    spark.stop()
  }
}
