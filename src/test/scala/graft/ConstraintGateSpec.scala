package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Constraints, Expectations, SnapshotLog}

/** Round 11: persisted CHECK constraints bind EVERY commit path, not
  * just SQL DML — the Scala API (commit, appends, upserts, updateWhere)
  * and the streaming foreachBatch sinks (appendBatch/commitBatch/
  * scopedBatch) route through the same gate, FAIL aborts with the
  * table unmoved, WARN/DROP audit identically to the SQL path, and
  * ADD CONSTRAINT validates existing rows like Delta.
  */
class ConstraintGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cgate").toString + "/t"

  private def fresh(rows: (Int, String)*): String = {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, rows.toSeq.toDF("k", "v"))
    root
  }

  private def rowsOf(root: String): Set[Seq[Any]] =
    SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet

  test("Scala appendCommit: FAIL constraint aborts with the table unmoved; clean append audits") {
    val root = fresh((1, "a"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.appendCommit(spark, root, Seq((-5, "bad")).toDF("k", "v"))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(rowsOf(root) == Set(Seq(1, "a")))
    val v = SnapshotLog.appendCommit(spark, root, Seq((2, "b")).toDF("k", "v"))
    assert(Expectations.audit(spark, root, v) ==
      Some(Map("rows_in" -> 1L, "k_pos" -> 0L)))
  }

  test("Scala commit / upsert / appendEvolved / appendOcc all gate") {
    val root = fresh((1, "a"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.commit(spark, root, Seq((-1, "x")).toDF("k", "v"))
    }
    intercept[Exception] {
      SnapshotLog.upsert(spark, root, Seq((-2, "y")).toDF("k", "v"), Seq("k"))
    }
    intercept[Exception] {
      SnapshotLog.appendEvolved(spark, root,
        Seq((-3, "z", 9L)).toDF("k", "v", "extra"))
    }
    intercept[Exception] {
      SnapshotLog.appendOcc(spark, root, Seq((-4, "w")).toDF("k", "v"))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(rowsOf(root) == Set(Seq(1, "a")))
    // the failed OCC staging write must not leak its writer-unique dir
    val leaked = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("data_u"))
    assert(leaked.isEmpty, s"staging debris: ${leaked.toSeq}")
  }

  test("streaming appendBatch: FAIL aborts table-unmoved; DROP counts like the SQL path") {
    val root = fresh((1, "a"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.appendBatch(spark, root, Seq((-7, "bad")).toDF("k", "v"),
        batchId = 0L)
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    // DROP policy: the violating micro-batch row is filtered, counted,
    // the batch commits, the replay stamp still gates
    Constraints.add(spark, root, "v_short", "length(v) <= 3", "DROP")
    val v = SnapshotLog.appendBatch(spark, root,
      Seq((7, "ok"), (8, "waytoolong")).toDF("k", "v"), batchId = 1L)
    assert(v.nonEmpty)
    assert(rowsOf(root) == Set(Seq(1, "a"), Seq(7, "ok")))
    assert(Expectations.audit(spark, root, v.get) ==
      Some(Map("rows_in" -> 2L, "k_pos" -> 0L, "v_short" -> 1L)))
    // a replay of the same batchId skips — no double audit, no new version
    assert(SnapshotLog.appendBatch(spark, root,
      Seq((7, "ok"), (8, "waytoolong")).toDF("k", "v"), batchId = 1L).isEmpty)
  }

  test("streaming commitBatch (keyed sink): FAIL aborts; carried table rows stay exempt") {
    val root = fresh((1, "a"), (2, "bb"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.commitBatch(spark, root, Seq((-9, "x")).toDF("k", "v"),
        Seq("k"), batchId = 0L)
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    // a DROP constraint the existing rows would violate must not delete
    // them through an unrelated micro-batch (only the BATCH gates)
    Constraints.add(spark, root, "v_1char", "length(v) <= 1", "DROP")
    val v = SnapshotLog.commitBatch(spark, root,
      Seq((3, "c"), (4, "dddd")).toDF("k", "v"), Seq("k"), batchId = 1L)
    assert(v.nonEmpty)
    assert(rowsOf(root) == Set(Seq(1, "a"), Seq(2, "bb"), Seq(3, "c")),
      "carried row (2, bb) must survive; batch row (4, dddd) must drop")
  }

  test("scoped paths gate: upsertScoped, scopedBatch, upsertScopedOcc") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "p1")).toDF("k", "v", "p"), Seq("k"), "p")
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.upsertScoped(spark, root,
        Seq((-1, "x", "p1")).toDF("k", "v", "p"), Seq("k"), "p")
    }
    intercept[Exception] {
      SnapshotLog.scopedBatch(spark, root,
        Seq((-2, "y", "p2")).toDF("k", "v", "p"), Seq("k"), "p", batchId = 0L)
    }
    intercept[Exception] {
      SnapshotLog.upsertScopedOcc(spark, root,
        Seq((-3, "z", "p2")).toDF("k", "v", "p"), Seq("k"), "p")
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(rowsOf(root) == Set(Seq(1, "a", "p1")))
    val leaked = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("data_u"))
    assert(leaked.isEmpty, s"staging debris: ${leaked.toSeq}")
    // DROP audits on the committed version, like the SQL path
    Constraints.add(spark, root, "v_short", "length(v) <= 3", "DROP")
    val v = SnapshotLog.scopedBatch(spark, root,
      Seq((5, "ok", "p1"), (6, "waytoolong", "p2")).toDF("k", "v", "p"),
      Seq("k"), "p", batchId = 1L).get
    assert(rowsOf(root) == Set(Seq(1, "a", "p1"), Seq(5, "ok", "p1")))
    assert(Expectations.audit(spark, root, v) ==
      Some(Map("rows_in" -> 2L, "k_pos" -> 0L, "v_short" -> 1L)))
  }

  test("Scala updateWhere (MoR): FAIL on a rewritten row aborts, table unmoved, no debris") {
    val root = fresh((1, "a"), (2, "b"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    intercept[Exception] {
      SnapshotLog.updateWhere(spark, root,
        base => base("v") === "a", Map("k" -> lit(-10)))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(rowsOf(root) == Set(Seq(1, "a"), Seq(2, "b")))
    // the OCC split path too
    intercept[Exception] {
      SnapshotLog.updateWhereOcc(spark, root,
        base => base("v") === "a",
        (_: org.apache.spark.sql.DataFrame) => Map("k" -> lit(-10)))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    val leaked = new java.io.File(root).listFiles()
      .map(_.getName).filter(n => n.startsWith("data_u") || n.startsWith("tomb_u"))
    assert(leaked.isEmpty, s"staging debris: ${leaked.toSeq}")
    // a clean update passes and audits the rewritten rows
    val v = SnapshotLog.updateWhereOcc(spark, root,
      base => base("v") === "a",
      (_: org.apache.spark.sql.DataFrame) => Map("k" -> lit(10)))
    assert(rowsOf(root) == Set(Seq(10, "a"), Seq(2, "b")))
    assert(Expectations.audit(spark, root, v) ==
      Some(Map("rows_in" -> 1L, "k_pos" -> 0L)))
  }

  test("ADD CONSTRAINT validates existing rows: FAIL refused on dirty data, WARN/DROP allowed") {
    val root = fresh((1, "a"), (-5, "dirty"))
    val e = intercept[Exception] {
      Constraints.add(spark, root, "k_pos", "k > 0")
    }
    assert(e.getMessage.contains("1 existing row"), e.getMessage)
    assert(Constraints.list(spark, root).isEmpty)
    // tolerant policies may be declared over dirty data by design
    Constraints.add(spark, root, "k_pos_warn", "k > 0", "WARN")
    Constraints.add(spark, root, "k_pos_drop", "k > 0", "DROP")
    assert(Constraints.list(spark, root).map(_.name).toSet ==
      Set("k_pos_warn", "k_pos_drop"))
    // NULL passes the ANSI check: a null-k row does not block a FAIL add
    val root2 = freshRoot()
    SnapshotLog.commit(spark, root2,
      Seq[(Option[Int], String)]((Some(1), "a"), (None, "n")).toDF("k", "v"))
    Constraints.add(spark, root2, "k_pos", "k > 0")
    assert(Constraints.list(spark, root2).map(_.name) == Seq("k_pos"))
  }

  test("maintenance stays exempt: compactSmallFiles/compactChain never re-gate carried rows") {
    val root = fresh((1, "a"))
    // dirty row lands under WARN, then the table compacts — a DROP/FAIL
    // style re-gate would delete or abort on it; maintenance must not
    Constraints.add(spark, root, "v_1char", "length(v) <= 1", "WARN")
    SnapshotLog.appendCommit(spark, root, Seq((2, "long")).toDF("k", "v"))
    val v = SnapshotLog.compactChain(spark, root)
    assert(SnapshotLog.currentVersion(spark, root).contains(v))
    assert(rowsOf(root) == Set(Seq(1, "a"), Seq(2, "long")),
      "compaction must carry every row through, gated by nothing")
    // deleteByKey's full-rewrite survivors are carried rows, also exempt
    SnapshotLog.deleteByKey(spark, root, Seq(1).toDF("k"), Seq("k"))
    assert(rowsOf(root) == Set(Seq(2, "long")))
  }

  test("audits MERGE when the in-log gate and a caller's expectations both record the same version") {
    val root = fresh((1, "a"))
    Constraints.add(spark, root, "k_pos", "k > 0", "WARN")
    // appendChecked layers caller expectations on a constrained table:
    // the version is audited twice — records must merge, not clobber
    // (and the second rename must not fail on the existing audit file)
    val (v, counts) = Expectations.appendChecked(spark, root,
      Seq((2, "bb"), (3, "c")).toDF("k", "v"),
      Seq(Expectations.warn("v_short", length(col("v")) <= 1)))
    assert(counts("v_short") == 1L)
    val merged = Expectations.audit(spark, root, v).get
    assert(merged.contains("k_pos") && merged.contains("v_short"),
      s"audit records must merge: $merged")
    assert(merged("k_pos") == 0L && merged("v_short") == 1L)
  }

  test("a constraint added while an OCC stage is in flight aborts the publish (stale-gate guard)") {
    val root = fresh((1, "a"))
    // scoped table for the scoped OCC split
    val sroot = freshRoot()
    SnapshotLog.upsertScoped(spark, sroot,
      Seq((1, "a", "p1")).toDF("k", "v", "p"), Seq("k"), "p")
    val staged = SnapshotLog.stageScopedOcc(spark, sroot,
      Seq((-5, "bad", "p2")).toDF("k", "v", "p"), Seq("k"), "p")
    // the constraint lands AFTER the stage gated (against zero checks)
    Constraints.add(spark, sroot, "k_pos", "k > 0", "WARN")
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishScopedOcc(spark, sroot, staged)
    }
    assert(e.getMessage.contains("constraints changed"), e.getMessage)
    assert(SnapshotLog.currentVersion(spark, sroot).contains(1L))
    // the flat MoR UPDATE split has the same guard
    val staged2 = SnapshotLog.stageUpdateWhereOcc(spark, root,
      base => base("v") === "a",
      (_: org.apache.spark.sql.DataFrame) => Map("k" -> lit(5)))
    Constraints.add(spark, root, "k_cap", "k < 100", "WARN")
    val e2 = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishUpdateOcc(spark, root, staged2)
    }
    assert(e2.getMessage.contains("constraints changed"), e2.getMessage)
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    // a re-run sees the new constraints and lands
    SnapshotLog.updateWhereOcc(spark, root,
      base => base("v") === "a",
      (_: org.apache.spark.sql.DataFrame) => Map("k" -> lit(5)))
    assert(rowsOf(root) == Set(Seq(5, "a")))
  }

  test("flat keyed upsert (pruned path): DROP filters the batch, FAIL aborts, survivors exact") {
    val root = freshRoot()
    (0 until 3).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        ((i * 100) until (i * 100 + 100)).map(k => (k, s"w$k"))
          .toDF("k", "v").coalesce(1), statsCols = Seq("k"))
    }
    Constraints.add(spark, root, "v_cap", "length(v) <= 6", "DROP")
    // batch: one clean update into dir 2's span, one violating insert
    val v = SnapshotLog.upsert(spark, root,
      Seq((150, "W150"), (9999, "waytoolong")).toDF("k", "v"), Seq("k"))
    val after = SnapshotLog.read(spark, root)
    assert(after.count() == 300, "violating insert must drop, nothing else")
    assert(after.filter($"k" === 150).select("v").as[String].head() == "W150")
    assert(Expectations.audit(spark, root, v).exists(_("v_cap") == 1L))
    // FAIL aborts before anything stages
    Constraints.add(spark, root, "k_cap", "k < 5000")
    intercept[Exception] {
      SnapshotLog.upsert(spark, root, Seq((7777, "x")).toDF("k", "v"), Seq("k"))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(v))
  }
}
