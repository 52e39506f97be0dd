package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{AnnIndex, EmbedOps}
import graft.sources.{IncrementalView, Maintenance, SnapshotLog}

/** Atomic multi-artifact refresh (round 14 — VERDICT r13 #7): a table
  * with registered views AND persisted ANN indexes converges to one
  * head through `Maintenance.refreshAll`, idempotently, after any crash
  * point — including the classic "table committed, index refresh never
  * ran" window that used to leave artifacts mutually stale with no verb
  * to repair them.
  */
class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_maint_$tag").toString + "/t"

  private def rows(ids: Range, gen: Int): DataFrame =
    ids.map { i =>
      val v = Array.tabulate(8)(d =>
        math.sin(i * 0.7 + d * 1.3 + gen * 0.37).toFloat)
      (i.toLong, s"g${i % 3}", (i % 50).toDouble, v.toSeq)
    }.toDF("vec_id", "grp", "amt", "embedding")

  private def viewRows(viewRoot: String): Set[(String, Long, BigDecimal)] =
    SnapshotLog.read(spark, viewRoot)
      .select("grp", "n_rows", "sum_amt").collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSet

  private def expectRows(sourceRoot: String): Set[(String, Long, BigDecimal)] = {
    val full = IncrementalView.aggregateMulti(
      SnapshotLog.read(spark, sourceRoot), Seq("grp"), Seq("amt"))
    full.select("grp", "n_rows", "sum_amt").collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSet
  }

  test("registry round-trips every view flavor") {
    val root = freshRoot("reg")
    SnapshotLog.commit(spark, root, rows(0 until 10, 0))
    val specs = Map(
      "keyed" -> Maintenance.ViewSpec("/tmp/v1", Seq("grp"), Seq("amt"),
        keys = Some(Seq("vec_id")), consumer = Some("view_keyed")),
      "extrema" -> Maintenance.ViewSpec("/tmp/v2", Seq("grp"), Seq("amt", "vec_id"),
        keys = Some(Seq("vec_id")), extrema = true),
      "keyless" -> Maintenance.ViewSpec("/tmp/v3", Seq("grp"), Seq("amt")),
      "distinct" -> Maintenance.ViewSpec("/tmp/v4", Seq("grp"),
        distinctCol = Some("vec_id")))
    specs.foreach { case (n, s) => Maintenance.registerView(spark, root, n, s) }
    assert(Maintenance.registeredViews(spark, root) == specs)
    Maintenance.unregisterView(spark, root, "keyless")
    assert(Maintenance.registeredViews(spark, root) == specs - "keyless")
    // malformed specs refuse at registration, not at refresh time
    intercept[IllegalArgumentException] {
      Maintenance.registerView(spark, root, "bad",
        Maintenance.ViewSpec("/tmp/vx", Seq("grp")))
    }
  }

  test("refreshAll converges a stale view + ANN index to the head; rerun is a no-op") {
    val root = freshRoot("conv")
    val viewRoot = freshRoot("convview")
    SnapshotLog.commit(spark, root, rows(0 until 200, 0),
      statsCols = Seq("vec_id"))
    AnnIndex.build(spark, root, k = 4, idCol = "vec_id")
    Maintenance.registerView(spark, root, "by_grp",
      Maintenance.ViewSpec(viewRoot, Seq("grp"), Seq("amt"),
        keys = Some(Seq("vec_id")), consumer = Some("view_by_grp")))
    assert(Maintenance.refreshAll(spark, root)
      .keySet == Set("view:by_grp", "ann:ivf"))
    assert(viewRows(viewRoot) == expectRows(root))
    // the table advances TWICE with NO artifact maintenance — the crash
    // window between table commit and derived refresh, held open
    SnapshotLog.upsert(spark, root, rows(50 until 60, 1), Seq("vec_id"))
    SnapshotLog.appendCommit(spark, root, rows(500 until 520, 1))
    val head = SnapshotLog.currentVersion(spark, root).get
    // both artifacts are stale: knn refuses loudly, the view lags
    val q = rows(510 until 511, 1).select("embedding")
      .head().getSeq[Float](0)
    intercept[IllegalArgumentException] {
      AnnIndex.knn(spark, root, q, k = 5)
    }
    assert(viewRows(viewRoot) != expectRows(root))
    // ONE verb converges everything
    val advanced = Maintenance.refreshAll(spark, root)
    assert(advanced == Map("view:by_grp" -> head, "ann:ivf" -> head))
    assert(viewRows(viewRoot) == expectRows(root))
    val got = AnnIndex.knn(spark, root, q, k = 300, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(510L))
    // exact parity with brute force — no stale or duplicate assignments
    assert(got == EmbedOps.knnBruteForce(SnapshotLog.read(spark, root), q, 300)
      .collect().map(_.getLong(0)).toSet)
    // idempotent: rerunning advances nothing and double-applies nothing
    assert(Maintenance.refreshAll(spark, root) ==
      Map("view:by_grp" -> head, "ann:ivf" -> head))
    assert(viewRows(viewRoot) == expectRows(root))
    // the view's consumer pin advanced with the walk (vacuum grace)
    assert(SnapshotLog.consumers(spark, root).get("view_by_grp")
      .contains(head))
  }

  test("mid-walk crash converges on rerun (one artifact fresh, one stale)") {
    val root = freshRoot("midwalk")
    val viewRoot = freshRoot("midview")
    SnapshotLog.commit(spark, root, rows(0 until 100, 0),
      statsCols = Seq("vec_id"))
    AnnIndex.build(spark, root, k = 4, idCol = "vec_id")
    Maintenance.registerView(spark, root, "by_grp",
      Maintenance.ViewSpec(viewRoot, Seq("grp"), Seq("amt"),
        keys = Some(Seq("vec_id"))))
    Maintenance.refreshAll(spark, root)
    SnapshotLog.upsert(spark, root, rows(10 until 30, 2), Seq("vec_id"))
    val head = SnapshotLog.currentVersion(spark, root).get
    // simulate a walk killed between the view refresh and the index
    // refresh: only the view advanced
    IncrementalView.refreshMulti(spark, root, viewRoot,
      Seq("vec_id"), Seq("grp"), Seq("amt"))
    assert(viewRows(viewRoot) == expectRows(root))
    // rerun the whole verb: the fresh view is a no-op (its own cursor
    // gates the replay), the stale index catches up
    assert(Maintenance.refreshAll(spark, root) ==
      Map("view:by_grp" -> head, "ann:ivf" -> head))
    assert(viewRows(viewRoot) == expectRows(root), "view double-applied")
    val q = rows(15 until 16, 2).select("embedding").head().getSeq[Float](0)
    val got = AnnIndex.knn(spark, root, q, k = 100, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == EmbedOps.knnBruteForce(SnapshotLog.read(spark, root), q, 100)
      .collect().map(_.getLong(0)).toSet)
  }
}
