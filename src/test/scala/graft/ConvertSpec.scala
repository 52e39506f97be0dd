package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round 12: CONVERT an existing parquet directory into a snapshot-log
  * table in place — zero bytes copied (Delta's CONVERT TO DELTA). The
  * spec proves the adoption is metadata-only (original files
  * byte-identical), that the full engine surface applies afterwards
  * (append, keyed upsert, DV delete, rename, CDC, compaction, vacuum
  * safety), that footer-derived stats give file skipping from the
  * first read, and the refusal edges (hive tree, occupied root,
  * version-dir name collision, empty dir).
  */
class ConvertSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_conv").toString + "/events"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("in-place convert is metadata-only; reads match; schema pinned") {
    val dir = freshDir()
    val src = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    src.write.parquet(dir)
    val before = fileState(dir)
    val v = SnapshotLog.convertParquet(spark, dir)
    assert(v == 1L && SnapshotLog.versions(spark, dir) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, dir)) == rows(src))
    assert(SnapshotLog.read(spark, dir).columns.toSeq == Seq("k", "v"))
    // not one byte of data touched
    assert(fileState(dir) == before, "convert touched the adopted files")
    // plain parquet readers of the raw dir keep working (_graft_log hidden)
    assert(rows(spark.read.parquet(dir)) == rows(src))
  }

  test("footer-derived stats sidecar gives file skipping from the first read") {
    val dir = freshDir()
    (0 until 4).foreach { i =>
      ((i * 100) until (i * 100 + 100)).map(k => (k, s"w$k")).toDF("k", "w")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    SnapshotLog.convertParquet(spark, dir, statsCols = Seq("k"))
    val df = SnapshotLog.readPruned(spark, dir).filter(col("k").between(110, 120))
    val got = df.collect().map(_.toSeq).toSet
    assert(got == (110 to 120).map(k => Seq(k, s"w$k")).toSet)
    val nFiles = df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      case s: FileSourceScanExec => Seq(s)
    }.flatten.map(_.metrics("numFiles").value).sum
    assert(nFiles == 1,
      s"expected the sidecar to prune to 1 of 4 adopted files, scanned $nFiles")
  }

  test("the full engine surface applies after convert") {
    val dir = freshDir()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    SnapshotLog.convertParquet(spark, dir, statsCols = Seq("k"))
    // O(batch) append (delta dir, adopted files untouched)
    val before = fileState(dir)
    SnapshotLog.appendCommit(spark, dir, Seq((3, "c")).toDF("k", "v"))
    before.foreach { case (p, st) =>
      assert(fileState(dir).get(p).contains(st), s"append touched adopted $p")
    }
    assert(rows(SnapshotLog.read(spark, dir)) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    // CDC across the append is the O(delta) insert feed
    val chg = SnapshotLog.changesBetween(spark, dir, 1L, 2L, Seq("k"))
    assert(rows(chg.select("change_type", "k")) == Set(Seq("insert", 3)))
    // keyed upsert
    SnapshotLog.upsert(spark, dir,
      Seq((2, "b2"), (4, "d")).toDF("k", "v"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, dir)) ==
      Set(Seq(1, "a"), Seq(2, "b2"), Seq(3, "c"), Seq(4, "d")))
    // deletion vector
    SnapshotLog.tombstoneDelete(spark, dir, Seq(Tuple1(1)).toDF("k"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, dir).select("k"))
      == Set(Seq(2), Seq(3), Seq(4)))
    // metadata-only rename through the pin
    SnapshotLog.renameColumn(spark, dir, "v", "val")
    assert(SnapshotLog.read(spark, dir).columns.toSeq == Seq("k", "val"))
    // time travel back to the adopted snapshot (pre-rename logical names)
    assert(rows(SnapshotLog.readVersion(spark, dir, 1L)) ==
      Set(Seq(1, "a"), Seq(2, "b")))
  }

  test("vacuum after compaction never reclaims adopted files") {
    val dir = freshDir()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    val adopted = fileState(dir).keySet
    SnapshotLog.convertParquet(spark, dir)
    SnapshotLog.appendCommit(spark, dir, Seq((3, "c")).toDF("k", "v"))
    SnapshotLog.compactChain(spark, dir)
    SnapshotLog.vacuum(spark, dir, keep = 1)
    // current read no longer references the originals, but vacuum must
    // not delete foreign bytes it never wrote
    assert(adopted.forall(p => new java.io.File(p).exists()),
      "vacuum reclaimed adopted foreign files")
    assert(rows(SnapshotLog.read(spark, dir)) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  test("refusal edges: hive tree, occupied root, version-dir name, empty dir") {
    // hive-partitioned tree refuses with guidance
    val hive = freshDir()
    Seq((1, "a", "x"), (2, "b", "y")).toDF("k", "v", "p")
      .write.partitionBy("p").parquet(hive)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.convertParquet(spark, hive)
    }
    assert(e1.getMessage.contains("partition-scoped"))
    // an already-committed table refuses a second convert
    val dir = freshDir()
    Seq((1, "a")).toDF("k", "v").write.parquet(dir)
    SnapshotLog.convertParquet(spark, dir)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.convertParquet(spark, dir)
    }
    assert(e2.getMessage.contains("already has a committed table"))
    // a directory named like a version dir refuses (DV/vacuum keying)
    val clash = Files.createTempDirectory("graft_conv").toString + "/data_v00000001"
    Seq((1, "a")).toDF("k", "v").write.parquet(clash)
    val e3 = intercept[IllegalArgumentException] {
      SnapshotLog.convertParquet(spark, clash)
    }
    assert(e3.getMessage.contains("version-dir naming"))
    // no parquet files
    val empty = Files.createTempDirectory("graft_conv").toString + "/empty"
    new java.io.File(empty).mkdirs()
    val e4 = intercept[IllegalArgumentException] {
      SnapshotLog.convertParquet(spark, empty)
    }
    assert(e4.getMessage.contains("no parquet files"))
  }

  test("converted table reads through format(\"graft\") and the skipping index") {
    val dir = freshDir()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    SnapshotLog.convertParquet(spark, dir, statsCols = Seq("k"))
    assert(rows(spark.read.format("graft").load(dir)) ==
      Set(Seq(1, "a"), Seq(2, "b")))
  }

  test("small-file compaction and zorder maintenance work on adopted lineages") {
    val dir = freshDir()
    (0 until 4).foreach { i =>
      Seq((i, i * 10L)).toDF("k", "n").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    SnapshotLog.convertParquet(spark, dir, statsCols = Seq("k"))
    val before = rows(SnapshotLog.read(spark, dir))
    SnapshotLog.compactSmallFiles(spark, dir, targetBytes = 128L * 1024 * 1024)
    assert(rows(SnapshotLog.read(spark, dir)) == before,
      "compaction changed the rows of an adopted lineage")
    // the compacted head no longer references the adopted files, but
    // they remain on disk (vacuum never reclaims foreign bytes)
    SnapshotLog.compactChain(spark, dir, nFiles = 2, zorderBy = Seq("k", "n"))
    assert(rows(SnapshotLog.read(spark, dir)) == before)
  }
}
