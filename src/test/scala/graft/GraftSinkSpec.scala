package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.{Constraints, SnapshotLog}

/** Round 11 (the r10 verdict's #2): the NATIVE streaming sink —
  * `df.writeStream.format("graft")` — write-side twin of the tail
  * source. Lowers onto the stamped commit paths, so every property the
  * foreachBatch idiom proved (exactly-once across restart AND across a
  * forced replay, O(batch)/O(touched-partition) commit cost, the
  * constraint gate) holds verbatim; plus the full round-trip:
  * writeStream → graft table → readStream tail.
  */
class GraftSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def dirFor(tag: String) =
    Files.createTempDirectory(s"graft_sink_$tag").toString

  test("append sink: delta versions, restart quiet, FORCED replay skipped by the stamp") {
    val dir = dirFor("append")
    val root = s"$dir/table"
    val stream = MemoryStream[Ev](spark)
    def start() = stream.toDF().writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt").start(root)
    val q = start()
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0),
                   Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).count() == 3)
    // O(batch): version 2's own delta dir holds only batch 1's rows
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 2,
      "append sink rewrote the table instead of appending a delta")
    // plain restart: no re-delivery, no version churn
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    // FORCED replay (kill between table commit and checkpoint commit):
    // removing the checkpoint's commit record makes Structured Streaming
    // re-deliver batch 1 on restart — the manifest's batchId stamp must
    // swallow it (ships nothing twice)
    val commit1 = new java.io.File(s"$dir/ckpt/commits/1")
    assert(commit1.isFile, "checkpoint layout drifted — test needs commits/1")
    assert(commit1.delete())
    // the local-FS checksum sidecar must go with it, or the re-written
    // commit record trips Hadoop's stale-CRC check
    new java.io.File(s"$dir/ckpt/commits/.1.crc").delete()
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L),
      "replayed batch landed twice")
    assert(SnapshotLog.read(spark, root).count() == 3)
  }

  test("append sink round-trip: writeStream → graft table → readStream tail") {
    val dir = dirFor("rt")
    val root = s"$dir/table"
    val stream = MemoryStream[Ev](spark)
    val w = stream.toDF().writeStream.format("graft")
      .option("checkpointLocation", s"$dir/wck").start(root)
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0))
    w.processAllAvailable()
    // tail the sink's table with the read side of the same format
    val r = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("sink_rt")
      .option("checkpointLocation", s"$dir/rck").start()
    try {
      r.processAllAvailable()
      assert(spark.table("sink_rt").count() == 1)
      stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 2, 2.0))
      w.processAllAvailable()
      r.processAllAvailable()
      assert(spark.table("sink_rt").select("event_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L))
    } finally { r.stop(); w.stop() }
  }

  test("upsert sink ≡ the foreachBatch commitBatch idiom, row for row") {
    val dirA = dirFor("upsA"); val dirB = dirFor("upsB")
    val batches = Seq(
      Seq(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
          Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0)),
      Seq(Ev(2, ts("2024-01-01 10:01:00"), 1, 20.0),
          Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0)))
    // native sink
    val sA = MemoryStream[Ev](spark)
    val qA = sA.toDF().writeStream.format("graft")
      .option("mode", "upsert").option("keys", "event_id")
      .option("checkpointLocation", s"$dirA/ck").start(s"$dirA/t")
    // foreachBatch twin
    val sB = MemoryStream[Ev](spark)
    val qB = sB.toDF().writeStream
      .option("checkpointLocation", s"$dirB/ck")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        { SnapshotLog.commitBatch(spark, s"$dirB/t", df, Seq("event_id"), id); () })
      .start()
    batches.foreach { b =>
      sA.addData(b: _*); sB.addData(b: _*)
      qA.processAllAvailable(); qB.processAllAvailable()
    }
    qA.stop(); qB.stop()
    def snap(root: String) = SnapshotLog.read(spark, root)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(snap(s"$dirA/t") == snap(s"$dirB/t"))
    assert(snap(s"$dirA/t") == Set((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    assert(SnapshotLog.versions(spark, s"$dirA/t") ==
      SnapshotLog.versions(spark, s"$dirB/t"))
  }

  test("scoped upsert sink: partitionBy option → O(touched partitions) scoped commits") {
    val dir = dirFor("scoped")
    val root = s"$dir/t"
    val stream = MemoryStream[Ev](spark)
    val q = stream.toDF().writeStream.format("graft")
      .option("mode", "upsert").option("keys", "event_id")
      .option("partitionBy", "user_id")
      .option("checkpointLocation", s"$dir/ck").start(root)
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 2, 2.0))
    q.processAllAvailable()
    stream.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, 10.0),
                   Ev(3, ts("2024-01-01 10:06:00"), 1, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq ==
      Seq((1L, 10.0), (2L, 2.0), (3L, 3.0)))
    // version 2's own data dir holds ONLY user 1's partition
    val own2 = new java.io.File(root, "data_v00000002")
    assert(own2.list().filter(_.startsWith("__gp=")).toSeq == Seq("__gp=1"),
      own2.list().toSeq.toString)
    assert(SnapshotLog.manifestKind(spark, root, 2L).contains("scoped"))
  }

  test("scoped sink composes with bucket(N) transforms: N stable leafs, point probes prune") {
    val dir = dirFor("bucket")
    val root = s"$dir/t"
    val stream = MemoryStream[Ev](spark)
    // a high-cardinality key with no natural partition column — the
    // round-11 bucket transform through the round-11 native sink
    val q = stream.toDF().writeStream.format("graft")
      .option("mode", "upsert").option("keys", "event_id")
      .option("partitionBy", "bucket(4, event_id)")
      .option("checkpointLocation", s"$dir/ck").start(root)
    stream.addData((1L to 20L).map(i =>
      Ev(i, ts("2024-01-01 10:00:00"), i % 3, i.toDouble)): _*)
    q.processAllAvailable()
    stream.addData(Ev(7, ts("2024-01-01 11:00:00"), 1, 70.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).count() == 20)
    assert(SnapshotLog.readEquals(spark, root, "event_id", 7L)
      .select("value").collect().head.getDouble(0) == 70.0)
    // batch 1 touched exactly ONE bucket leaf; the probe prunes to it
    val own2 = new java.io.File(root, "data_v00000002")
    assert(own2.list().count(_.startsWith("__gp=")) == 1, own2.list().toSeq)
    val (kept, total) = SnapshotLog.candidateFiles(spark, root,
      SnapshotLog.currentVersion(spark, root).get, "event_id", 7L, 7L)
    assert(kept.map(_.getParent.getName).toSet.size == 1 && kept.size < total,
      s"kept ${kept.map(_.getParent.getName)} of $total")
  }

  test("replace sink: outputMode complete rebuilds the snapshot per batch, stamped") {
    val dir = dirFor("replace")
    val root = s"$dir/t"
    val stream = MemoryStream[Ev](spark)
    val counts = stream.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("graft")
      .option("mode", "replace").outputMode("complete")
      .option("checkpointLocation", s"$dir/ck").start(root)
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0))
    q.processAllAvailable()
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0),
                   Ev(3, ts("2024-01-01 10:02:00"), 2, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (2L, 1L)))
    // each batch is one full replace version; pinned history intact
    assert(SnapshotLog.readVersion(spark, root, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
  }

  test("the sink rides the constraint gate: a violating micro-batch fails the query, table unmoved") {
    val dir = dirFor("gate")
    val root = s"$dir/t"
    SnapshotLog.commit(spark, root,
      Seq((1L, ts("2024-01-01 10:00:00"), 1L, 1.0))
        .toDF("event_id", "ts", "user_id", "value"))
    Constraints.add(spark, root, "v_pos", "value > 0")
    val stream = MemoryStream[Ev](spark)
    val q = stream.toDF().writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ck").start(root)
    stream.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, -5.0))
    val ex = intercept[Exception] { q.processAllAvailable() }
    q.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("v_pos")), messages(ex).toString)
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(SnapshotLog.read(spark, root).count() == 1)
  }

  test("mor sink: O(batch) delta per micro-batch, shadowing resolves, replay skipped") {
    val dir = dirFor("mor")
    val root = s"$dir/t"
    val stream = MemoryStream[Ev](spark)
    def start() = stream.toDF().writeStream.format("graft")
      .option("mode", "upsert").option("keys", "event_id")
      .option("mor", "true")
      .option("checkpointLocation", s"$dir/ck").start(root)
    val q = start()
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 2, 2.0))
    q.processAllAvailable()
    stream.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, 9.0))
    q.processAllAvailable()
    q.stop()
    // newest wins at read; the second commit wrote ONLY its batch
    val got = SnapshotLog.read(spark, root).select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 9.0), (2L, 2.0)), s"mor sink resolution: $got")
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 1,
      "mor sink rewrote the snapshot instead of appending O(batch)")
    // forced replay of batch 1 ships nothing twice
    val commit1 = new java.io.File(s"$dir/ck/commits/1")
    assert(commit1.isFile); assert(commit1.delete())
    new java.io.File(s"$dir/ck/commits/.1.crc").delete()
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L),
      "replayed mor batch landed twice")
    // refusal edges at start(): mor with partitionBy, mor off upsert
    intercept[Exception] {
      stream.toDF().writeStream.format("graft").option("mode", "upsert")
        .option("keys", "event_id").option("mor", "true")
        .option("partitionBy", "user_id")
        .option("checkpointLocation", s"$dir/ck2").start(s"$dir/t2")
    }
    intercept[Exception] {
      stream.toDF().writeStream.format("graft").option("mode", "append")
        .option("mor", "true")
        .option("checkpointLocation", s"$dir/ck3").start(s"$dir/t3")
    }
  }

  test("overwrite sink: each micro-batch restates its partitions wholesale") {
    val dir = dirFor("dpo")
    val root = s"$dir/t"
    val stream = MemoryStream[Ev](spark)
    val q = stream.toDF().writeStream.format("graft")
      .option("mode", "overwrite").option("partitionBy", "user_id")
      .option("checkpointLocation", s"$dir/ck").start(root)
    stream.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
                   Ev(2, ts("2024-01-01 10:01:00"), 2, 2.0))
    q.processAllAvailable()
    // batch 1 restates user 1 only: event 1 REPLACED (not merged) by
    // event 3, user 2 untouched
    stream.addData(Ev(3, ts("2024-01-01 10:06:00"), 1, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotLog.read(spark, root).select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((3L, 3.0), (2L, 2.0)),
      "overwrite sink must replace the touched partition, not merge it")
    // keyless wholesale replace needs no keys; refusal edges at start()
    intercept[Exception] {  // overwrite without partitionBy
      stream.toDF().writeStream.format("graft").option("mode", "overwrite")
        .option("checkpointLocation", s"$dir/ck2").start(s"$dir/t2")
    }
    intercept[Exception] {  // overwrite with keys
      stream.toDF().writeStream.format("graft").option("mode", "overwrite")
        .option("keys", "event_id").option("partitionBy", "user_id")
        .option("checkpointLocation", s"$dir/ck3").start(s"$dir/t3")
    }
  }

  test("option validation fails at start(), not first batch") {
    val dir = dirFor("opts")
    val stream = MemoryStream[Ev](spark)
    intercept[Exception] {   // upsert without keys
      stream.toDF().writeStream.format("graft").option("mode", "upsert")
        .option("checkpointLocation", s"$dir/ck1").start(s"$dir/t1")
    }
    intercept[Exception] {   // unknown mode
      stream.toDF().writeStream.format("graft").option("mode", "merge")
        .option("checkpointLocation", s"$dir/ck2").start(s"$dir/t2")
    }
    intercept[Exception] {   // append + partitionBy: scoped needs upsert
      stream.toDF().writeStream.format("graft")
        .option("partitionBy", "user_id")
        .option("checkpointLocation", s"$dir/ck3").start(s"$dir/t3")
    }
    intercept[Exception] {   // replace without complete mode would
      // silently truncate the table to the last micro-batch
      stream.toDF().writeStream.format("graft").option("mode", "replace")
        .option("checkpointLocation", s"$dir/ck4").start(s"$dir/t4")
    }
  }

  test("annRefresh option: the sink keeps the persisted ANN index at the head") {
    val dir = dirFor("annref")
    val root = s"$dir/emb"
    def vec(id: Long): Seq[Float] = {
      val axis = (id % 4).toInt
      (0 until 8).map(d => if (d == axis) 1f else 0.01f * ((id + d) % 7))
    }
    // seed the table and build the index OUTSIDE the stream
    SnapshotLog.commit(spark, root,
      (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      statsCols = Seq("vec_id"))
    graft.engine.AnnIndex.build(spark, root, k = 4)
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = stream.toDF().toDF("vec_id", "embedding").writeStream
      .format("graft").option("annRefresh", "true")
      .option("checkpointLocation", s"$dir/ckpt").start(root)
    stream.addData((1000L, vec(1000L)), (1001L, vec(1001L)))
    q.processAllAvailable()
    stream.addData((1002L, vec(1002L)))
    q.processAllAvailable()
    q.stop()
    // the index followed every committed batch — no staleness refusal,
    // and the streamed vectors are probeable immediately
    val m = graft.engine.AnnIndex.model(spark, root, "ivf").get
    assert(m.indexedVersion == SnapshotLog.currentVersion(spark, root).get,
      "sink did not refresh the index to the head")
    val got = graft.engine.AnnIndex
      .knn(spark, root, vec(1002L), k = 43, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(got.size == 43 && got.contains(1002L), s"streamed row missing")
  }

  test("mvRefresh option: the sink keeps registered views continuously fresh (r14)") {
    val dir = dirFor("mvref")
    val root = s"$dir/facts"
    val viewRoot = s"$dir/facts_mv"
    SnapshotLog.commit(spark, root,
      Seq((1L, "a", 5.0), (2L, "b", 3.0)).toDF("id", "grp", "amt"),
      statsCols = Seq("id"))
    graft.sources.Maintenance.registerView(spark, root, "by_grp",
      graft.sources.Maintenance.ViewSpec(viewRoot, Seq("grp"), Seq("amt"),
        keys = Some(Seq("id"))))
    def viewRows(): Set[(String, Long, BigDecimal)] =
      SnapshotLog.read(spark, viewRoot)
        .select("grp", "n_rows", "sum_amt").collect()
        .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
        .toSet
    val stream = MemoryStream[(Long, String, Double)](spark)
    val q = stream.toDF().toDF("id", "grp", "amt").writeStream
      .format("graft").option("mode", "upsert").option("keys", "id")
      .option("mvRefresh", "true")
      .option("checkpointLocation", s"$dir/ckpt").start(root)
    stream.addData((3L, "a", 2.0), (1L, "b", 7.0)) // insert + group-move
    q.processAllAvailable()
    assert(viewRows() == Set(("a", 1L, BigDecimal("2.000000")),
      ("b", 2L, BigDecimal("10.000000"))), viewRows().toString)
    stream.addData((2L, "b", 4.0)) // in-place update
    q.processAllAvailable()
    q.stop()
    assert(viewRows() == Set(("a", 1L, BigDecimal("2.000000")),
      ("b", 2L, BigDecimal("11.000000"))), viewRows().toString)
    // the view is exactly at the head — CALL refresh_all has nothing left
    assert(SnapshotLog.lastBatchId(spark, viewRoot).contains(
      SnapshotLog.currentVersion(spark, root).get))
  }
}
