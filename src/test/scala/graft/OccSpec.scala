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
}
