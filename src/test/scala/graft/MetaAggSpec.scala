package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round 12: METADATA-ONLY AGGREGATES — COUNT(*)/COUNT(col)/numeric
  * MIN/MAX answered from the stats sidecar in O(manifest), zero data
  * IO. The spec proves exact answers in both sidecar storage regimes
  * (driver text and distributed parquet checkpoint), and — the half
  * that keeps it honest — every bail condition where an approximate
  * answer would be WRONG: deletion vectors, merge-on-read shadowing,
  * missing stats coverage, string columns (truncated footer bounds).
  */
class MetaAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_meta").toString + "/t"

  test("row count, non-null count, min/max from the text sidecar — exact") {
    val root = freshRoot()
    val df = Seq((1, Some(10L), "a"), (2, None, "b"), (3, Some(30L), "c"))
      .toDF("k", "n", "s")
    SnapshotLog.commit(spark, root, df, statsCols = Seq("k", "n"))
    assert(SnapshotLog.metaRowCount(spark, root) == Some(3L))
    assert(SnapshotLog.metaNonNullCount(spark, root, "n") == Some(2L))
    assert(SnapshotLog.metaNonNullCount(spark, root, "k") == Some(3L))
    assert(SnapshotLog.metaMinMax(spark, root, "k") == Some((1, 3)))
    assert(SnapshotLog.metaMinMax(spark, root, "n") == Some((10L, 30L)))
    // strings bail: parquet may truncate their footer bounds
    assert(SnapshotLog.metaMinMax(spark, root, "s") == None)
    // appends keep the answers exact (carry + fresh lines)
    SnapshotLog.appendCommit(spark, root,
      Seq((4, Some(40L), "d")).toDF("k", "n", "s"))
    assert(SnapshotLog.metaRowCount(spark, root) == Some(4L))
    assert(SnapshotLog.metaMinMax(spark, root, "k") == Some((1, 4)))
    // time travel: the asked version answers, not the head
    assert(SnapshotLog.metaRowCount(spark, root, Some(1L)) == Some(3L))
  }

  test("parquet-checkpoint regime answers distributed (no driver span map)") {
    val root = freshRoot()
    spark.conf.set("graft.stats.checkpointThresholdBytes", "1")
    try {
      (0 until 3).foreach { i =>
        SnapshotLog.appendCommit(spark, root,
          ((i * 10) until (i * 10 + 10)).map(k => (k, s"w$k")).toDF("k", "w"),
          statsCols = Seq("k"))
      }
      assert(SnapshotLog.lastStatsMode.startsWith("parquet"),
        s"expected checkpoint regime, got ${SnapshotLog.lastStatsMode}")
      assert(SnapshotLog.metaRowCount(spark, root) == Some(30L))
      assert(SnapshotLog.metaNonNullCount(spark, root, "k") == Some(30L))
      assert(SnapshotLog.metaMinMax(spark, root, "k") == Some((0, 29)))
    } finally spark.conf.unset("graft.stats.checkpointThresholdBytes")
  }

  test("all-NULL column answers (null, null); fractional types exact") {
    val root = freshRoot()
    val df = Seq((1.5, Option.empty[Double]), (2.5, None), (-0.25, None))
      .toDF("d", "e")
    SnapshotLog.commit(spark, root, df, statsCols = Seq("d", "e"))
    assert(SnapshotLog.metaMinMax(spark, root, "d") == Some((-0.25, 2.5)))
    assert(SnapshotLog.metaMinMax(spark, root, "e") == Some((null, null)))
    assert(SnapshotLog.metaNonNullCount(spark, root, "e") == Some(0L))
  }

  test("every inexact case bails to None: DV, MoR, no stats, missing column") {
    // no statsCols → no z lines → None (a scan must answer)
    val bare = freshRoot()
    SnapshotLog.commit(spark, bare, Seq((1, "a")).toDF("k", "v"))
    assert(SnapshotLog.metaRowCount(spark, bare) == None)
    // deletion vectors: file rows ≠ visible rows
    val dv = freshRoot()
    SnapshotLog.commit(spark, dv,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), statsCols = Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, dv) == Some(2L))
    SnapshotLog.tombstoneDelete(spark, dv, Seq(Tuple1(1)).toDF("k"), Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, dv) == None)
    // merge-on-read shadowing
    val mor = freshRoot()
    SnapshotLog.upsertMor(spark, mor,
      Seq((1, "a")).toDF("k", "v"), Seq("k"), statsCols = Seq("k"))
    SnapshotLog.upsertMor(spark, mor,
      Seq((1, "a2")).toDF("k", "v"), Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, mor) == None)
    // a column without stats coverage
    val part = freshRoot()
    SnapshotLog.commit(spark, part,
      Seq((1, 5L)).toDF("k", "n"), statsCols = Seq("k"))
    assert(SnapshotLog.metaNonNullCount(spark, part, "n") == None)
    assert(SnapshotLog.metaMinMax(spark, part, "n") == None)
  }

  test("column-mapped lineage translates the logical name to the stats key") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "k", "key")
    assert(SnapshotLog.metaMinMax(spark, root, "key") == Some((1, 2)))
    assert(SnapshotLog.metaNonNullCount(spark, root, "key") == Some(2L))
  }

  test("scoped lineages, rewrites and compaction keep (or correctly lose) coverage") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", 10), (2, "b", 20)).toDF("k", "p", "n"),
      Seq("k"), "p", statsCols = Seq("n"))
    assert(SnapshotLog.metaRowCount(spark, root) == Some(2L))
    assert(SnapshotLog.metaMinMax(spark, root, "n") == Some((10, 20)))
    // a scoped upsert rewrites one leaf; coverage carries
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", 15), (3, "b", 30)).toDF("k", "p", "n"), Seq("k"), "p")
    assert(SnapshotLog.metaRowCount(spark, root) == Some(3L))
    assert(SnapshotLog.metaMinMax(spark, root, "n") == Some((15, 30)))
    // the keyed flat upsert (file rewrite) keeps coverage too
    val flat = freshRoot()
    SnapshotLog.commit(spark, flat,
      Seq((1, 5L), (2, 6L)).toDF("k", "n"), statsCols = Seq("k", "n"))
    SnapshotLog.upsert(spark, flat, Seq((2, 60L), (3, 70L)).toDF("k", "n"), Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, flat) == Some(3L))
    assert(SnapshotLog.metaMinMax(spark, flat, "n") == Some((5L, 70L)))
    // compactChain rewrites everything; coverage carries through it
    SnapshotLog.compactChain(spark, flat)
    assert(SnapshotLog.metaRowCount(spark, flat) == Some(3L))
    // a converted table answers from its footer-derived sidecar
    val conv = Files.createTempDirectory("graft_meta_conv").toString + "/raw"
    spark.range(0, 50).selectExpr("id AS k").coalesce(2).write.parquet(conv)
    SnapshotLog.convertParquet(spark, conv, statsCols = Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, conv) == Some(50L))
    assert(SnapshotLog.metaMinMax(spark, conv, "k") == Some((0L, 49L)))
  }

  test("STATSCOLS record: O(1) inheritance; legacy tables fall back and self-heal") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), statsCols = Seq("k"))
    assert(SnapshotLog.readStatsColsRecord(spark, root) == Some(Seq("k")))
    // simulate a legacy table (committed before the record existed)
    val rec = new java.io.File(s"$root/_graft_log/STATSCOLS")
    assert(rec.delete())
    new java.io.File(s"$root/_graft_log/.STATSCOLS.crc").delete()
    // inheritance still works through the sidecar derivation...
    SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v"))
    assert(SnapshotLog.metaRowCount(spark, root) == Some(3L))
    // ...and the commit re-created the record (self-healing)
    assert(SnapshotLog.readStatsColsRecord(spark, root) == Some(Seq("k")))
    // a stat-less full rewrite RESETS the record — appends after it
    // must not resurrect stats the rewrite dropped
    SnapshotLog.commit(spark, root, Seq((9, "z")).toDF("k", "v"))
    assert(SnapshotLog.readStatsColsRecord(spark, root) == Some(Seq.empty))
    SnapshotLog.appendCommit(spark, root, Seq((10, "y")).toDF("k", "v"))
    assert(SnapshotLog.metaRowCount(spark, root) == None)
  }
}
