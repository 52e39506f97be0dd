package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** Multi-writer optimistic concurrency (round-6 VERDICT item 4): the
  * expensive data write happens with no lock held; the claimed critical
  * section is metadata-only. Disjoint writers both land serialized with
  * no lost update; a conflicting writer aborts cleanly, table untouched.
  */
class OccSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_occ").toString + "/table"

  private def kv(pairs: (Int, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  private def t(ps: (Int, String, String)*): DataFrame =
    ps.toSeq.toDF("k", "p", "v")

  private def rows3(df: DataFrame): Set[(Int, String, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  test("two genuinely concurrent appendOcc writers both land, nothing lost") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(0 -> "seed"))
    // both writers stage and publish concurrently; the claim wait (not a
    // hard failure) serializes only their metadata sections
    val fa = Future { SnapshotLog.appendOcc(spark, root, kv(1 -> "a", 2 -> "b")) }
    val fb = Future { SnapshotLog.appendOcc(spark, root, kv(3 -> "c", 4 -> "d")) }
    val (va, vb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(va, vb) == Set(2L, 3L), s"versions $va/$vb")
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set(0 -> "seed", 1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
    // the intermediate version holds exactly the first-published append
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L, 3L))
  }

  test("interleaved scoped writers on DISJOINT partitions: both land, second rebases") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p")
    // both writers stage against v1 — neither sees the other
    val s1 = SnapshotLog.stageScopedOcc(spark, root, t((1, "a", "X1")), Seq("k"), "p")
    val s2 = SnapshotLog.stageScopedOcc(spark, root, t((3, "b", "y3")), Seq("k"), "p")
    assert(SnapshotLog.publishScopedOcc(spark, root, s1) == 2L)
    // s2's base is stale but v2 touched only partition a — rebase lands it
    assert(SnapshotLog.publishScopedOcc(spark, root, s2) == 3L)
    assert(rows3(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1"), (3, "b", "y3")))
  }

  test("interleaved scoped writers on the SAME partition: the loser aborts cleanly") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p")
    val s1 = SnapshotLog.stageScopedOcc(spark, root, t((1, "a", "X1")), Seq("k"), "p")
    val s2 = SnapshotLog.stageScopedOcc(spark, root, t((1, "a", "LOST")), Seq("k"), "p")
    SnapshotLog.publishScopedOcc(spark, root, s1)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishScopedOcc(spark, root, s2)
    }
    assert(e.getMessage.contains("same partitions"), e.getMessage)
    // the abort left no debris and no torn state: the winner's update holds
    assert(rows3(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "X1"), (2, "b", "y1")))
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("data_u")), "staging debris left behind")
    // and the clean retry (recompute against the new head) succeeds
    SnapshotLog.upsertScopedOcc(spark, root, t((1, "a", "RETRIED")), Seq("k"), "p")
    assert(rows3(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "RETRIED"), (2, "b", "y1")))
  }

  test("a delete or append landing mid-flight aborts a staged scoped commit") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "b", "y1")), Seq("k"), "p")
    val s = SnapshotLog.stageScopedOcc(spark, root, t((3, "a", "x3")), Seq("k"), "p")
    SnapshotLog.tombstoneDelete(spark, root, Seq(2).toDF("k"), Seq("k"))
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishScopedOcc(spark, root, s)
    }
    assert(e.getMessage.contains("non-scoped commit"), e.getMessage)
    assert(rows3(SnapshotLog.read(spark, root)) == Set((1, "a", "x1")))
  }

  test("appendOcc matches appendCommit semantics: schema guard, stats carry, O(batch) dirs") {
    val root = freshRoot()
    SnapshotLog.appendOcc(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendOcc(spark, root, kv(2 -> "b"), statsCols = Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
    // type drift refused, staging removed
    val drifted = Seq((9L, "z")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SnapshotLog.appendOcc(spark, root, drifted)
    }
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("data_u")))
    // carried stats prune across the OCC chain
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 2L, "k", 1, 1)
    assert(kept.size < total, s"kept ${kept.size} of $total")
  }

  // ---- round 10: OCC for deletion-vector DML (stage outside the claim)

  test("two concurrent file-disjoint OCC deletes both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot()
    // two appended dirs = two disjoint file sets, spans recorded
    SnapshotLog.appendCommit(spark, root,
      (0 until 100).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      (100 until 200).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    val fa = Future { SnapshotLog.tombstoneDeleteOcc(spark, root,
      Seq(5, 6).toDF("k"), Seq("k")) }
    val fb = Future { SnapshotLog.tombstoneDeleteOcc(spark, root,
      Seq(150).toDF("k"), Seq("k")) }
    val (va, vb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(va, vb) == Set(3L, 4L), s"got $va, $vb")
    val got = SnapshotLog.read(spark, root).collect().map(_.getInt(0)).toSet
    assert(!got.contains(5) && !got.contains(6) && !got.contains(150))
    assert(got.size == 197)
    // no staging debris
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("tomb_u")))
  }

  test("an overlapping OCC delete aborts cleanly with the table untouched") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 100).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    // both stage against the SAME head and touch the SAME file
    val s1 = SnapshotLog.stageTombstoneOcc(spark, root, Seq(5).toDF("k"), Seq("k"))
    val s2 = SnapshotLog.stageTombstoneOcc(spark, root, Seq(7).toDF("k"), Seq("k"))
    assert(SnapshotLog.publishTombstoneOcc(spark, root, s1) == 2L)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishTombstoneOcc(spark, root, s2)
    }
    assert(e.getMessage.contains("deletion vector landed"), e.getMessage)
    // the loser left nothing: head still v2, its staging dir removed,
    // rows of the losing delete still present
    assert(SnapshotLog.currentVersion(spark, root).contains(2L))
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("tomb_u")))
    val got = SnapshotLog.read(spark, root).collect().map(_.getInt(0)).toSet
    assert(!got.contains(5) && got.contains(7))
    // the loser re-runs against the new head and lands
    assert(SnapshotLog.tombstoneDeleteOcc(spark, root,
      Seq(7).toDF("k"), Seq("k")) == 3L)
    assert(!SnapshotLog.read(spark, root).collect().map(_.getInt(0)).toSet
      .contains(7))
  }

  test("a rewrite landing mid-flight aborts a staged OCC delete") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 50).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    val s = SnapshotLog.stageTombstoneOcc(spark, root, Seq(5).toDF("k"), Seq("k"))
    // a full rewrite replaces every file the staged positions reference
    SnapshotLog.commit(spark, root,
      (0 until 50).map(k => (k, s"B$k")).toDF("k", "v"))
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishTombstoneOcc(spark, root, s)
    }
    assert(e.getMessage.contains("replaced data entries"), e.getMessage)
    assert(SnapshotLog.read(spark, root).count() == 50)
  }

  test("predicate OCC delete: two concurrent disjoint SQL-shaped DELETEs both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 100).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      (100 until 200).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    val fa = Future { SnapshotLog.tombstoneDeleteWhereOcc(spark, root,
      b => b("k") < 3) }
    val fb = Future { SnapshotLog.tombstoneDeleteWhereOcc(spark, root,
      b => b("k") >= 197) }
    val (va, vb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(va, vb) == Set(3L, 4L), s"got $va, $vb")
    val got = SnapshotLog.read(spark, root).agg(
      org.apache.spark.sql.functions.count(col("k"))).head.getLong(0)
    assert(got == 194, s"expected 194 survivors, got $got")
  }

  test("OCC MoR update: concurrent with a disjoint delete, both land; overlap aborts") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 100).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      (100 until 200).map(k => (k, s"b$k")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    // stage an update on file 1 and a delete on file 2 against the SAME
    // head — the second publish rebases over the first
    val su = SnapshotLog.stageUpdateWhereOcc(spark, root,
      b => b("k") === 5, _ => Map("v" -> lit("U5")))
    val sd = SnapshotLog.stageTombstoneOcc(spark, root,
      Seq(150).toDF("k"), Seq("k"))
    assert(SnapshotLog.publishTombstoneOcc(spark, root, sd) == 3L)
    assert(SnapshotLog.publishUpdateOcc(spark, root, su) == 4L)
    val got = SnapshotLog.read(spark, root)
    assert(got.filter(col("k") === 5).head.getString(1) == "U5")
    assert(got.filter(col("k") === 150).count() == 0)
    assert(got.count() == 199)
    // OVERLAP: an update staged on file 1 loses to a delete that landed
    // on file 1 first — aborts with both staging dirs cleaned
    val su2 = SnapshotLog.stageUpdateWhereOcc(spark, root,
      b => b("k") === 6, _ => Map("v" -> lit("U6")))
    SnapshotLog.tombstoneDelete(spark, root, Seq(7).toDF("k"), Seq("k")) // v5
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.publishUpdateOcc(spark, root, su2)
    }
    assert(e.getMessage.contains("deletion vector landed"), e.getMessage)
    assert(!new java.io.File(root).listFiles()
      .exists(f => f.getName.startsWith("tomb_u") || f.getName.startsWith("data_u")))
    assert(SnapshotLog.read(spark, root)
      .filter(col("k") === 6).head.getString(1) == "a6")
  }

  test("an append mid-flight rebases under the OCC delete (snapshot contract)") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      (0 until 50).map(k => (k, s"a$k")).toDF("k", "v").coalesce(1))
    val s = SnapshotLog.stageTombstoneOcc(spark, root, Seq(5).toDF("k"), Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      Seq((100, "late")).toDF("k", "v").coalesce(1)) // v2: disjoint files
    assert(SnapshotLog.publishTombstoneOcc(spark, root, s) == 3L)
    val got = SnapshotLog.read(spark, root).collect().map(_.getInt(0)).toSet
    assert(!got.contains(5) && got.contains(100), got.toString)
    assert(got.size == 50)
    // CDC folds the rebased delete positionally, exactly once
    val diff = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
    val deletes = diff.collect().filter(_.getString(0) == "delete")
    assert(deletes.map(_.getInt(1)).toSeq == Seq(5))
  }

  /** Round 11 (the r10 verdict's #7): a pruned keyed MERGE whose head
    * moved between probe and publish REBASES its staged slice over a
    * file-disjoint interleaving (one staged write each) instead of
    * re-probing; an interleaving that touched the SAME file refuses the
    * rebase and the retry loop re-probes against the new head.
    */
  test("pruned MERGE rebases over a disjoint interleaving; same-file overlap re-probes") {
    def chain(root: String): Unit = (0 until 4).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        ((i * 100) until (i * 100 + 100)).map(k => (k, s"w$k")).toDF("k", "v")
          .coalesce(1), statsCols = Seq("k"))
    }
    def filesUnder(root: String, dir: String): Map[String, Long] = {
      val d = new java.io.File(new java.io.File(root), dir)
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    // --- DISJOINT: A merges k=150 (file 2); B lands k=350 (file 4)
    // between A's probe and A's publish — A rebases, both land, one
    // staged write each, untouched files byte-identical
    val root = freshRoot()
    chain(root)
    val before13 = Seq("data_v00000001", "data_v00000003")
      .map(d => d -> filesUnder(root, d)).toMap
    val cur = SnapshotLog.currentVersion(spark, root).get
    var bVersion = -1L
    val vA = SnapshotLog.rewriteMatchedFlat(spark, root, cur,
      Seq(150).toDF("k"), Seq("k"), Seq("k"), Nil) { visible =>
      // the interleaving lands while A's slice is probed-but-unstaged —
      // exactly the stage/publish race window
      bVersion = SnapshotLog.upsert(spark, root,
        Seq((350, "B350")).toDF("k", "v"), Seq("k"))
      graft.sources.Upsert.upsert(visible,
        Seq((150, "A150")).toDF("k", "v"), Seq("k"))
    }
    assert(bVersion == cur + 1)
    assert(vA.contains(cur + 2), s"A must REBASE onto B's head, got $vA")
    val out = SnapshotLog.read(spark, root)
    assert(out.count() == 400)
    assert(out.filter(out("k").isin(150, 350)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((150, "A150"), (350, "B350")))
    Seq("data_v00000001", "data_v00000003").foreach { d =>
      assert(filesUnder(root, d) == before13(d), s"$d was touched")
    }
    // --- OVERLAP: B rewrites the SAME file A matched — the rebase
    // refuses (stale slice), A's direct attempt returns None with the
    // staging swept; the public retry path then lands it cleanly
    val root2 = freshRoot()
    chain(root2)
    val cur2 = SnapshotLog.currentVersion(spark, root2).get
    val vA2 = SnapshotLog.rewriteMatchedFlat(spark, root2, cur2,
      Seq(150).toDF("k"), Seq("k"), Seq("k"), Nil) { visible =>
      SnapshotLog.upsert(spark, root2,
        Seq((155, "B155")).toDF("k", "v"), Seq("k"))
      graft.sources.Upsert.upsert(visible,
        Seq((150, "A150")).toDF("k", "v"), Seq("k"))
    }
    assert(vA2.isEmpty, "a same-file interleaving must refuse the rebase")
    val leaked = new java.io.File(root2).listFiles()
      .map(_.getName).filter(_.startsWith("data_u"))
    assert(leaked.isEmpty, s"refused rebase leaked staging: ${leaked.toSeq}")
    // the retry loop (the upsert entry point) re-probes and lands both
    SnapshotLog.upsert(spark, root2, Seq((150, "A150")).toDF("k", "v"), Seq("k"))
    val out2 = SnapshotLog.read(spark, root2)
    assert(out2.filter(out2("k").isin(150, 155)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((150, "A150"), (155, "B155")))
    assert(out2.count() == 400)
  }
}
