package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured facts for ROW TRACKING (round 12): what the stable-id
  * machinery costs on the hot paths.
  *
  *   1. APPEND overhead: commits on a tracked vs untracked lineage —
  *      the delta is one footer row-count pass over the commit's own
  *      files (the design claim: zero per-row bytes, O(batch files)
  *      metadata).
  *   2. READ overhead: `readWithRowIds` vs the plain snapshot read —
  *      the delta is the (rel → base) side-join + id arithmetic.
  *   3. Rewrite preservation cost: a tracked vs untracked compaction
  *      (the tracked one materializes the id column into the packed
  *      files — per-row bytes exactly where rewrites happen).
  *
  * Run: `sbt "runMain graft.tools.RowTrackBench [nDirs] [rowsPerDir]"`.
  */
object RowTrackBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDirs = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(1000000)
    val base = java.nio.file.Files.createTempDirectory("graft_rtbench").toString

    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("k").withColumn("v", md5(col("k").cast("string")))
      .coalesce(1)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    def appends(root: String): Seq[Double] =
      (0 until nDirs).map(d => time {
        SnapshotLog.appendCommit(spark, root, seed(d), statsCols = Seq("k"))
      })

    // tracked lineage: enable on an empty-ish table, then append
    val rootT = s"$base/tracked"
    SnapshotLog.commit(spark, rootT, seed(0), statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, rootT)
    val tApp = appends(rootT)
    // untracked twin
    val rootU = s"$base/untracked"
    SnapshotLog.commit(spark, rootU, seed(0), statsCols = Seq("k"))
    val uApp = appends(rootU)

    val nTotal = (nDirs + 1).toLong * rows
    // like-for-like: BOTH sides aggregate a real column (a bare count()
    // would let the plain side answer from parquet footer counts)
    val tRead = (1 to 3).map(_ => time {
      assert(SnapshotLog.readWithRowIds(spark, rootT)
        .agg(max(col("_row_id"))).head.getLong(0) == nTotal - 1)
    })
    val uRead = (1 to 3).map(_ => time {
      assert(SnapshotLog.read(spark, rootU)
        .agg(max(col("k"))).head.getLong(0) == nDirs.toLong * rows - 1)
    })
    // distinctness of the derived ids (the correctness spot-check at scale)
    val distinct = SnapshotLog.readWithRowIds(spark, rootT)
      .select("_row_id").distinct().count()
    assert(distinct == nTotal, s"id collision: $distinct of $nTotal")

    val tComp = time { SnapshotLog.compactSmallFiles(spark, rootT, 1L << 40) }
    val uComp = time { SnapshotLog.compactSmallFiles(spark, rootU, 1L << 40) }
    // identity preservation across the compaction, asserted
    assert(SnapshotLog.readWithRowIds(spark, rootT)
      .select("_row_id").distinct().count() == nTotal)

    println(f"[rtbench] dirs=${nDirs + 1} rowsPerDir=$rows ($nTotal rows)")
    println(f"[rtbench] append  median: tracked ${median(tApp)}%.2f s vs untracked ${median(uApp)}%.2f s (+${(median(tApp) / median(uApp) - 1) * 100}%.0f%%)")
    println(f"[rtbench] read    median: withRowIds ${median(tRead)}%.2f s vs plain ${median(uRead)}%.2f s")
    println(f"[rtbench] compact:        tracked $tComp%.2f s vs untracked $uComp%.2f s (materializes the id column)")

    // ---- MERGE-ON-READ (round 13): shadow-commit overhead with
    // tracking on — the delta is the candidate-pruned (keys → id)
    // probe of the visible snapshot each upsertMor joins in
    def morTable(tag: String, track: Boolean): String = {
      val r = s"$base/mor_$tag"
      SnapshotLog.createMorTable(spark, r, seed(0).schema, Seq("k"))
      SnapshotLog.upsertMor(spark, r, seed(0), Seq("k"),
        statsCols = Seq("k"))
      if (track) SnapshotLog.enableRowTracking(spark, r)
      r
    }
    def morBatches(r: String): Seq[Double] =
      (1 to 8).map { i => time {
        // half updates (keys from dir 0), half inserts
        val b = spark.range(i.toLong * rows / 2, i.toLong * rows / 2 + 10000)
          .toDF("k").withColumn("v", md5(col("k").cast("string")))
        SnapshotLog.upsertMor(spark, r, b, Seq("k"))
      }}
    val mT = morBatches(morTable("t", track = true))
    val mU = morBatches(morTable("u", track = false))
    // inheritance is exact: updated keys keep ids, inserts are fresh
    val rT = s"$base/mor_t"
    val idsNow = SnapshotLog.readWithRowIds(spark, rT)
      .select("_row_id").distinct().count()
    assert(idsNow == SnapshotLog.read(spark, rT).count(),
      "tracked MoR ids must stay unique")
    println(f"[rtbench] upsertMor median: tracked ${median(mT)}%.2f s vs untracked ${median(mU)}%.2f s (+${(median(mT) / median(mU) - 1) * 100}%.0f%%)")
    spark.stop()
  }
}
