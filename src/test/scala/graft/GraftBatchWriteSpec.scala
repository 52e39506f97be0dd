package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sources.{Constraints, SnapshotLog}

/** Round 11: the BATCH side of `format("graft")` — `df.write.format
  * ("graft")` lowering onto the same commit paths as the Scala API, SQL
  * DML, and the streaming sink. The spec proves the SaveMode ladder
  * (create / ignore / append / keyed upsert / scoped upsert /
  * overwrite), the commit-cost shape each mode inherits (delta-dir
  * append, untouched-leaf byte identity), the `txnVersion` idempotent
  * retry stamp, the constraint gate, and the refusal edges.
  */
class GraftBatchWriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_bw").toString + "/table"

  private def t(ps: (Int, String, String)*): DataFrame =
    ps.toSeq.toDF("k", "p", "v")

  private def rows(df: DataFrame): Set[(Int, String, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  /** (path → (bytes, mtime)) of every parquet file under dir. */
  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("create ladder: default errors on existing, ignore no-ops, overwrite replaces") {
    val root = freshRoot()
    // writer default (ErrorIfExists) creates version 1
    t((1, "a", "x")).write.format("graft").save(root)
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a", "x")))
    // second default-mode save refuses — the table exists
    val e = intercept[IllegalStateException] {
      t((2, "b", "y")).write.format("graft").save(root)
    }
    assert(e.getMessage.contains("already exists"))
    // ignore: exists → no-op, nothing committed
    t((2, "b", "y")).write.format("graft").mode("ignore").save(root)
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a", "x")))
    // overwrite: full-snapshot replace as the next version (readers on
    // version 1 keep their files — commit never deletes)
    t((9, "z", "w")).write.format("graft").mode("overwrite").save(root)
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    assert(rows(SnapshotLog.read(spark, root)) == Set((9, "z", "w")))
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) == Set((1, "a", "x")))
  }

  test("mode=append is the O(batch) delta append; old files byte-identical") {
    val root = freshRoot()
    t((1, "a", "x"), (2, "b", "y")).write.format("graft").save(root)
    val before = fileState(new java.io.File(root))
    t((3, "c", "z")).write.format("graft").mode("append").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x"), (2, "b", "y"), (3, "c", "z")))
    // delta shape: version 2's own dir holds ONLY the appended batch
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 1,
      "batch append rewrote the snapshot instead of appending a delta")
    // and version 1's files are untouched bytes
    val after = fileState(new java.io.File(root))
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"append touched pre-existing $p")
    }
  }

  test("mode=append with keys is the keyed upsert (update + insert)") {
    val root = freshRoot()
    t((1, "a", "x"), (2, "b", "y")).write.format("graft").save(root)
    t((2, "b", "y2"), (3, "c", "z")).write.format("graft").mode("append")
      .option("keys", "k").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x"), (2, "b", "y2"), (3, "c", "z")))
  }

  test("keys + partitionBy is the scoped upsert: untouched leafs byte-identical") {
    val root = freshRoot()
    // first keyed+partitioned write CREATES the scoped table
    t((1, "a", "x1"), (2, "b", "y1"), (3, "c", "z1"))
      .write.format("graft").option("keys", "k").partitionBy("p").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x1"), (2, "b", "y1"), (3, "c", "z1")))
    val untouched = fileState(new java.io.File(root)).filter {
      case (p, _) => p.contains("__gp=b") || p.contains("__gp=c")
    }
    assert(untouched.nonEmpty, "expected scoped leaf dirs for p=b / p=c")
    // touch only partition a
    t((1, "a", "x2")).write.format("graft").mode("append")
      .option("keys", "k").partitionBy("p").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x2"), (2, "b", "y1"), (3, "c", "z1")))
    val after = fileState(new java.io.File(root))
    untouched.foreach { case (p, st) =>
      assert(after.get(p).contains(st),
        s"scoped batch write rewrote untouched leaf file $p")
    }
  }

  test("option(partitionBy) spells transform specs the writer API cannot") {
    val root = freshRoot()
    Seq((1, java.sql.Date.valueOf("2024-01-01"), "x"),
        (2, java.sql.Date.valueOf("2024-03-05"), "y"))
      .toDF("k", "d", "v")
      .write.format("graft").option("keys", "k")
      .option("partitionBy", "months(d)").save(root)
    val leafs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data_v"))
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).toSet
    assert(leafs.exists(_.contains("2024-01")) &&
           leafs.exists(_.contains("2024-03")),
      s"months() transform did not produce month leafs: $leafs")
  }

  test("option(mor): keyed writes land as O(batch) MoR deltas; txn stamps compose") {
    val root = freshRoot()
    // first save CREATES the merge-on-read lineage
    t((1, "a", "x"), (2, "b", "y")).write.format("graft")
      .option("keys", "k").option("mor", "true").save(root)
    val before = fileState(new java.io.File(root))
    // append-mode keyed write shadows by key, O(batch): old files untouched
    t((2, "b", "Y2")).write.format("graft").mode("append")
      .option("keys", "k").option("mor", "true").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x"), (2, "b", "Y2")))
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 1,
      "mor batch write rewrote the snapshot")
    val after = fileState(new java.io.File(root))
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"mor write touched old file $p")
    }
    // a retried job (same txnVersion) ships nothing twice
    t((3, "c", "z")).write.format("graft").mode("append")
      .option("keys", "k").option("mor", "true")
      .option("txnVersion", "7").save(root)
    t((3, "c", "DUP")).write.format("graft").mode("append")
      .option("keys", "k").option("mor", "true")
      .option("txnVersion", "7").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x"), (2, "b", "Y2"), (3, "c", "z")))
    // refusals: mor without keys, mor with partitionBy, and a keyed
    // NON-mor write on the MoR lineage (no silent flat conversion)
    intercept[IllegalArgumentException] {
      t((9, "q", "w")).write.format("graft").mode("append")
        .option("mor", "true").save(root)
    }
    intercept[IllegalArgumentException] {
      t((9, "q", "w")).write.format("graft").mode("append")
        .option("keys", "k").option("mor", "true").partitionBy("p")
        .save(root)
    }
    val conv = intercept[IllegalArgumentException] {
      t((9, "q", "w")).write.format("graft").mode("append")
        .option("keys", "k").save(root)
    }
    assert(conv.getMessage.contains("upsertMor"))
  }

  test("txnVersion makes retried writes idempotent across all append shapes") {
    val root = freshRoot()
    t((1, "a", "x")).write.format("graft").save(root)
    def appendTxn(): Unit =
      t((2, "b", "y")).write.format("graft").mode("append")
        .option("txnVersion", "1").save(root)
    appendTxn()
    assert(SnapshotLog.read(spark, root).count() == 2)
    appendTxn() // the retry: same stamp → skipped, nothing double-applied
    assert(SnapshotLog.read(spark, root).count() == 2)
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    // keyed shape too
    def upsertTxn(): Unit =
      t((2, "b", "y2")).write.format("graft").mode("append")
        .option("keys", "k").option("txnVersion", "2").save(root)
    upsertTxn(); upsertTxn()
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "x"), (2, "b", "y2")))
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L, 3L))
  }

  test("the constraint gate covers batch writes: FAIL aborts, table unmoved") {
    val root = freshRoot()
    t((1, "a", "x")).write.format("graft").save(root)
    Constraints.add(spark, root, "k_pos", "k > 0")
    val e = intercept[Exception] {
      t((-5, "b", "y")).write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage.contains("k_pos"), s"not the constraint error: $e")
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a", "x")))
  }

  test("refusal edges: partitionBy without keys; overwrite with keys") {
    val root = freshRoot()
    val e1 = intercept[IllegalArgumentException] {
      t((1, "a", "x")).write.format("graft").mode("append")
        .partitionBy("p").save(root)
    }
    assert(e1.getMessage.contains("keys"))
    val e2 = intercept[IllegalArgumentException] {
      t((1, "a", "x")).write.format("graft").mode("overwrite")
        .option("keys", "k").save(root)
    }
    assert(e2.getMessage.contains("no keys"))
  }

  test("mergeSchema appends evolve additively; refusals guard the rest (round 12)") {
    val root = freshRoot()
    Seq((1, "a")).toDF("k", "v").write.format("graft").save(root)
    // new column appends; pre-evolution rows null-fill
    Seq((2, "b", 9L)).toDF("k", "v", "n").write.format("graft")
      .mode("append").option("mergeSchema", "true").save(root)
    val after = SnapshotLog.read(spark, root)
    assert(after.columns.toSeq == Seq("k", "v", "n"))
    assert(after.collect().map(_.toSeq).toSet ==
      Set(Seq(1, "a", null), Seq(2, "b", 9L)))
    // a batch MISSING a table column null-fills it at the declared type
    Seq((3, 7L)).toDF("k", "n").write.format("graft")
      .mode("append").option("mergeSchema", "true").save(root)
    assert(SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet ==
      Set(Seq(1, "a", null), Seq(2, "b", 9L), Seq(3, null, 7L)))
    // without mergeSchema the drifted batch still refuses loudly
    val e1 = intercept[IllegalArgumentException] {
      Seq((4, "d", 1L, true)).toDF("k", "v", "n", "b").write.format("graft")
        .mode("append").save(root)
    }
    assert(e1.getMessage.contains("schema"))
    // mergeSchema never widens TYPES (that is widenColumnType's verb)
    val e2 = intercept[IllegalArgumentException] {
      Seq((5L, "e", 1L)).toDF("k", "v", "n").write.format("graft")
        .mode("append").option("mergeSchema", "true").save(root)
    }
    assert(e2.getMessage.toLowerCase.contains("additively"))
    // and refuses on keyed/scoped/mor shapes
    val e3 = intercept[IllegalArgumentException] {
      Seq((6, "f", 1L)).toDF("k", "v", "n").write.format("graft")
        .mode("append").option("keys", "k")
        .option("mergeSchema", "true").save(root)
    }
    assert(e3.getMessage.contains("flat appends only"))
  }
}
