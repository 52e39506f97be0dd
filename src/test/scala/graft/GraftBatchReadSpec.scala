package graft

// (withRowIds reader-option case added round 12 — see the bottom suite)

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog
import graft.streaming.GraftBatchRead

/** Round 12: the BATCH READ side of `format("graft")` —
  * `spark.read.format("graft").load(root)` falling back from the DSv2
  * probe onto the v1 relation that wraps the exact
  * [[SnapshotLog.readVersion]] plan. The spec proves row parity with
  * the Scala API (snapshot, time travel, deletion vectors,
  * merge-on-read), snapshot pinning at load, pushdown THROUGH the v1
  * boundary (file skipping + column pruning measured on the inner
  * plan), the batch CDC option, and the refusal edges.
  */
class GraftBatchReadSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_br").toString + "/table"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("load(root) matches SnapshotLog.read and pins the version at load") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("graft").save(root)
    val pinned = spark.read.format("graft").load(root)
    assert(rows(pinned) == rows(SnapshotLog.read(spark, root)))
    // a commit AFTER load must not change what the pinned frame reads
    Seq((3, "c")).toDF("k", "v").write.format("graft").mode("append").save(root)
    assert(rows(pinned) == Set(Seq(1, "a"), Seq(2, "b")),
      "batch read failed snapshot isolation: post-load commit leaked in")
    assert(rows(spark.read.format("graft").load(root)).size == 3)
  }

  test("versionAsOf and timestampAsOf time travel") {
    val root = freshRoot()
    Seq((1, "a")).toDF("k", "v").write.format("graft").save(root)
    Seq((2, "b")).toDF("k", "v").write.format("graft").mode("append").save(root)
    assert(rows(spark.read.format("graft").option("versionAsOf", 1).load(root))
      == Set(Seq(1, "a")))
    // timestamp between the two commits resolves to version 1; the
    // commit clock is the manifest mtime, so pick the instant OF v1
    val t1 = SnapshotLog.commitTimeOf(spark, root, 1L)
    val got = rows(spark.read.format("graft")
      .option("timestampAsOf", t1.toString).load(root))
    assert(got == Set(Seq(1, "a")) || got == Set(Seq(1, "a"), Seq(2, "b")),
      s"timestampAsOf($t1) resolved outside the committed range: $got")
    // far future → head; far past → loud
    assert(rows(spark.read.format("graft")
      .option("timestampAsOf", "2999-01-01").load(root)).size == 2)
    val e = intercept[IllegalStateException] {
      spark.read.format("graft")
        .option("timestampAsOf", "1999-01-01").load(root)
    }
    assert(e.getMessage.contains("no version"))
  }

  test("deletion vectors and merge-on-read resolution apply through format read") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .write.format("graft").save(root)
    SnapshotLog.tombstoneDelete(spark, root,
      Seq(Tuple1(2)).toDF("k"), Seq("k"))
    assert(rows(spark.read.format("graft").load(root))
      == Set(Seq(1, "a"), Seq(3, "c")))
    // merge-on-read: latest-wins resolution must ride along
    val mor = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("graft")
      .option("keys", "k").option("mor", "true").save(mor)
    Seq((2, "b2")).toDF("k", "v").write.format("graft").mode("append")
      .option("keys", "k").option("mor", "true").save(mor)
    assert(rows(spark.read.format("graft").load(mor))
      == Set(Seq(1, "a"), Seq(2, "b2")))
  }

  test("filters prune FILES through the v1 boundary; columns prune to ReadSchema") {
    spark.conf.set("graft.testHooks.enabled", "true")
    val root = freshRoot()
    (0 until 4).foreach { i =>
      val batch = ((i * 100) until (i * 100 + 100))
        .map(k => (k, s"w$k")).toDF("k", "w").coalesce(1)
      SnapshotLog.appendCommit(spark, root, batch, statsCols = Seq("k"))
    }
    def innerScans(): Seq[FileSourceScanExec] =
      GraftBatchRead.lastInnerScan.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        case f: FileSourceScanExec => Seq(f)
      }.flatten
    val df = spark.read.format("graft").load(root)
      .filter(col("k").between(110, 120)).select("w")
    assert(rows(df) == (110 to 120).map(k => Seq(s"w$k")).toSet)
    val scans = innerScans()
    assert(scans.map(_.metrics("numFiles").value).sum == 1,
      "stats-sidecar file skipping did not engage through the v1 relation")
    // column pruning reached the parquet ReadSchema (k is filter-only)
    assert(scans.forall(_.requiredSchema.fieldNames.toSet == Set("k", "w")))
    val dfW = spark.read.format("graft").load(root).select("w")
    assert(dfW.collect().length == 400)
    assert(innerScans().forall(_.requiredSchema.fieldNames.toSeq == Seq("w")),
      "projection did not prune the inner scan to the required column")
  }

  test("COUNT(*) works (zero required columns)") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("graft").save(root)
    assert(spark.read.format("graft").load(root).count() == 2)
  }

  test("changes=true is the batch CDC surface (table_changes shape)") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("graft").save(root)
    Seq((2, "b2"), (3, "c")).toDF("k", "v").write.format("graft")
      .mode("append").option("keys", "k").save(root)
    val feed = spark.read.format("graft")
      .option("changes", "true").option("keys", "k")
      .option("startingVersion", 1).load(root)
    assert(rows(feed) ==
      rows(SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))))
    assert(feed.columns.toSeq ==
      Seq("change_type", "k", "old_v", "new_v"))
    val byType = feed.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byType == Map("insert" -> 1, "update" -> 1))
  }

  test("refusal edges: missing table, conflicting options, bad timestamp") {
    val e1 = intercept[IllegalStateException] {
      spark.read.format("graft").load(freshRoot())
    }
    assert(e1.getMessage.contains("no committed table"))
    val root = freshRoot()
    Seq((1, "a")).toDF("k", "v").write.format("graft").save(root)
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", 1)
        .option("timestampAsOf", "2026-01-01").load(root)
    }
    assert(e2.getMessage.contains("mutually exclusive"))
    val e3 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("changes", "true")
        .option("keys", "k").load(root)
    }
    assert(e3.getMessage.contains("startingVersion"))
    val e4 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("changes", "true")
        .option("startingVersion", 1).load(root)
    }
    assert(e4.getMessage.contains("keys"))
    val e5 = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("timestampAsOf", "not-a-time").load(root)
    }
    assert(e5.getMessage.contains("cannot parse"))
  }

  test("column-mapped lineage reads logical names through format read") {
    val root = freshRoot()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("graft").save(root)
    SnapshotLog.renameColumn(spark, root, "v", "val")
    val df = spark.read.format("graft").load(root)
    assert(df.columns.toSeq == Seq("k", "val"))
    assert(rows(df.filter(col("val") === "a")) == Set(Seq(1, "a")))
  }

  test("scoped (partitioned) and upserted lineages read through the format") {
    val root = freshRoot()
    Seq((1, "a", "x"), (2, "a", "y"), (3, "b", "z")).toDF("k", "p", "v")
      .write.format("graft").option("keys", "k").partitionBy("p").save(root)
    assert(rows(spark.read.format("graft").load(root)) ==
      Set(Seq(1, "a", "x"), Seq(2, "a", "y"), Seq(3, "b", "z")))
    // a scoped upsert touches one leaf; the format read sees the merge
    Seq((2, "a", "y2")).toDF("k", "p", "v").write.format("graft")
      .mode("append").option("keys", "k").option("partitionBy", "p").save(root)
    assert(rows(spark.read.format("graft").load(root)) ==
      Set(Seq(1, "a", "x"), Seq(2, "a", "y2"), Seq(3, "b", "z")))
    // time travel across the scoped merge
    assert(rows(spark.read.format("graft").option("versionAsOf", 1).load(root))
      .contains(Seq(2, "a", "y")))
  }

  test("a converted table tails through readStream (adopted files ship as the initial load)") {
    val dir = Files.createTempDirectory("graft_br_conv").toString + "/raw"
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    SnapshotLog.convertParquet(spark, dir)
    SnapshotLog.appendCommit(spark, dir, Seq((3, "c")).toDF("k", "v"))
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("conv_tail_sink").start()
    try {
      q.processAllAvailable()
      assert(rows(spark.table("conv_tail_sink")) ==
        Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    } finally q.stop()
  }

  test("withRowIds=true reads the snapshot with stable identities (round 12)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    SnapshotLog.enableRowTracking(spark, root)
    val before = spark.read.format("graft").option("withRowIds", "true")
      .load(root).select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(before.size == 2 && before.values.toSet.size == 2)
    SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v"))
    val v2 = SnapshotLog.currentVersion(spark, root).get
    val after = spark.read.format("graft").option("withRowIds", "true")
      .option("versionAsOf", v2).load(root)
      .select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after.size == 3 && after(1) == before(1) && after(2) == before(2))
    // filters push through the boundary over the id frame too
    assert(spark.read.format("graft").option("withRowIds", "true")
      .load(root).filter("k = 3").count() == 1)
    // conflicting options refuse
    intercept[Exception] {
      spark.read.format("graft").option("withRowIds", "true")
        .option("changes", "true").option("keys", "k")
        .option("startingVersion", 1).load(root)
    }
  }
}
