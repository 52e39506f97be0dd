package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{Layout, SnapshotLog}

/** Measured fact for the snapshot-log file-skipping feature (the same
  * role ProfileSkew/FuzzyCrossover play for their features): commit the
  * sf0.1 events table range-clustered on user_id with min/max + bloom
  * stats, then compare full-scan-filter vs pruned reads — files touched
  * (the scale-free structural metric: at 100 TB "files touched" IS the
  * cost) and wall time (min of 3, noisy at MB scale where open() costs
  * dominate). Run: `sbt "runMain graft.tools.SkipBench [dataDir]"`.
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("graft_skipbench")
      .toString + "/events"

    val events = graft.engine.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val nFiles = 32
    SnapshotLog.commit(spark, root,
      Layout.zArrange(events, Seq("user_id", "value"), nFiles),
      statsCols = Seq("user_id", "value"), bloomCols = Seq("event_id"))
    // event-TIME skipping needs time-clustered layout — a second table
    // range-clustered on ts (the streaming-ingest natural order)
    val rootTs = root + "_ts"
    SnapshotLog.commit(spark, rootTs,
      events.repartitionByRange(nFiles, org.apache.spark.sql.functions.col("ts")),
      statsCols = Seq("ts"))

    def timeMin3(f: => Long): (Long, Double) = {
      var rows = 0L
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
      }.min
      (rows, t)
    }

    // narrow user range — the clustered read
    val (loU, hiU) = (100L, 120L)
    val (keptR, total) = SnapshotLog.candidateFiles(spark, root, 1L, "user_id", loU, hiU)
    val (fullRows, fullT) = timeMin3(
      SnapshotLog.read(spark, root).filter(col("user_id").between(loU, hiU)).count())
    val (prunedRows, prunedT) = timeMin3(
      SnapshotLog.readBetween(spark, root, "user_id", loU, hiU).count())
    require(fullRows == prunedRows, s"row mismatch: $fullRows vs $prunedRows")
    println(f"RANGE  user_id in [$loU,$hiU]: files ${keptR.size}/$total, " +
      f"rows $prunedRows, full $fullT%.3fs pruned $prunedT%.3fs")

    // the same range through the AUTOMATIC path: plain .filter over the
    // stats-aware FileIndex must match the explicit probe on files/rows
    val (autoRows, autoT) = timeMin3(
      SnapshotLog.readPruned(spark, root)
        .filter(col("user_id").between(loU, hiU)).count())
    require(autoRows == fullRows, s"row mismatch: $autoRows vs $fullRows")
    println(f"AUTO   user_id in [$loU,$hiU] via readPruned: " +
      f"rows $autoRows, pruned-auto $autoT%.3fs (explicit $prunedT%.3fs)")

    // conjunctive range on BOTH z-order columns — the multi-column payoff
    // only the automatic path expresses as one ordinary filter
    val (conjRows, conjT) = timeMin3(
      SnapshotLog.readPruned(spark, root)
        .filter(col("user_id").between(loU, hiU) && col("value").between(10.0, 20.0))
        .count())
    val (conjFullRows, conjFullT) = timeMin3(
      SnapshotLog.read(spark, root)
        .filter(col("user_id").between(loU, hiU) && col("value").between(10.0, 20.0))
        .count())
    require(conjRows == conjFullRows, s"row mismatch: $conjRows vs $conjFullRows")
    println(f"CONJ   user_id+value via readPruned: rows $conjRows, " +
      f"full $conjFullT%.3fs pruned-auto $conjT%.3fs")

    // point lookup on the hash-distributed event_id — bloom territory
    val probe = 54321L
    val (keptB, _) = SnapshotLog.candidateFilesEquals(spark, root, 1L, "event_id", probe)
    val (fullRows2, fullT2) = timeMin3(
      SnapshotLog.read(spark, root).filter(col("event_id") === probe).count())
    val (prunedRows2, prunedT2) = timeMin3(
      SnapshotLog.readEquals(spark, root, "event_id", probe).count())
    require(fullRows2 == prunedRows2, s"row mismatch: $fullRows2 vs $prunedRows2")
    println(f"POINT  event_id=$probe: files ${keptB.size}/$total, " +
      f"rows $prunedRows2, full $fullT2%.3fs pruned $prunedT2%.3fs")

    // event-time window on the ts-clustered table (temporal ISO stats)
    val span = spark.read.parquet(s"$rootTs/data_v00000001")
      .agg(min(col("ts")), max(col("ts"))).head()
    val t0 = span.getAs[java.time.LocalDateTime](0)
    val (loT, hiT) = (t0.plusHours(24), t0.plusHours(30)) // a 6h window
    val (keptT, _) = SnapshotLog.candidateFiles(spark, rootTs, 1L, "ts", loT, hiT)
    val (fullRows3, fullT3) = timeMin3(
      SnapshotLog.read(spark, rootTs)
        .filter(col("ts").between(lit(loT), lit(hiT))).count())
    val (prunedRows3, prunedT3) = timeMin3(
      SnapshotLog.readBetween(spark, rootTs, "ts", loT, hiT).count())
    require(fullRows3 == prunedRows3, s"row mismatch: $fullRows3 vs $prunedRows3")
    println(f"TIME   ts in [$loT,$hiT]: files ${keptT.size}/$total, " +
      f"rows $prunedRows3, full $fullT3%.3fs pruned $prunedT3%.3fs")
    spark.stop()
  }
}
