package graft

import org.apache.spark.sql.functions._
import graft.sources.{Expectations, SnapshotLog}

/** Commit-time data-quality expectations: warn counts, drop removes,
  * fail aborts with the table untouched; counts ride the commit's own
  * write scan (observe), and each checked version persists an audit
  * record that lives and dies with the manifest.
  */
class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_expect").toString + "/t"

  private val batch = Seq(
    (1, "alice", 25), (2, "bob", -3), (3, null.asInstanceOf[String], 40),
    (4, "dora", 17)).toDF("id", "name", "age")

  test("warn counts violations but commits every row; audit persists") {
    val root = freshRoot()
    val (v, counts) = Expectations.commitChecked(spark, root, batch, Seq(
      Expectations.warn("age_nonneg", col("age") >= 0),
      Expectations.warn("name_present", col("name").isNotNull)))
    assert(v == 1L)
    assert(counts == Map("rows_in" -> 4L, "age_nonneg" -> 1L, "name_present" -> 1L))
    assert(SnapshotLog.read(spark, root).count() == 4)
    assert(Expectations.audit(spark, root, 1L).contains(counts))
  }

  test("drop removes violating rows; counts still reflect the FULL batch") {
    val root = freshRoot()
    val (_, counts) = Expectations.commitChecked(spark, root, batch, Seq(
      Expectations.drop("age_nonneg", col("age") >= 0),
      Expectations.warn("adult", col("age") >= 18)))
    assert(counts("rows_in") == 4L && counts("age_nonneg") == 1L)
    // warn counts the pre-drop batch: dora(17) AND bob(-3) both flag
    assert(counts("adult") == 2L)
    assert(SnapshotLog.read(spark, root).select("id").as[Int].collect().toSet ==
      Set(1, 3, 4))
  }

  test("NULL predicate is a violation (pipeline gate), droppable") {
    val root = freshRoot()
    // name LIKE on a NULL name evaluates NULL → row 3 must drop
    val (_, counts) = Expectations.commitChecked(spark, root, batch, Seq(
      Expectations.drop("name_wordy", length(col("name")) >= 3)))
    assert(counts("name_wordy") == 1L)
    assert(SnapshotLog.read(spark, root).select("id").as[Int].collect().toSet ==
      Set(1, 2, 4))
  }

  test("fail aborts the commit mid-write; table untouched, next commit clean") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, batch.filter(col("age") >= 0))
    intercept[Exception] {
      Expectations.commitChecked(spark, root, batch, Seq(
        Expectations.fail("age_nonneg", col("age") >= 0)))
    }
    // the pointer never moved and the reader sees the old version
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(SnapshotLog.read(spark, root).count() == 3)
    assert(Expectations.audit(spark, root, 2L).isEmpty)
    // the table is not wedged: the next writer recovers the debris
    val (v, _) = Expectations.commitChecked(spark, root,
      batch.filter(col("age") >= 0),
      Seq(Expectations.fail("age_nonneg", col("age") >= 0)))
    assert(v == 2L)
    assert(SnapshotLog.read(spark, root).count() == 3)
  }

  test("fail checks the rows being committed: a drop can rescue the batch") {
    val root = freshRoot()
    val (_, counts) = Expectations.commitChecked(spark, root, batch, Seq(
      Expectations.drop("age_nonneg", col("age") >= 0),
      Expectations.fail("committed_adultish", col("age") >= 10)))
    // bob(-3) violates BOTH; the drop removes him before the fail assert
    assert(counts("age_nonneg") == 1L)
    assert(SnapshotLog.read(spark, root).count() == 3)
  }

  test("appendChecked gates the O(batch) append path; audits accrue per version") {
    val root = freshRoot()
    val good = Seq((1, "a", 30)).toDF("id", "name", "age")
    val mixed = Seq((2, "b", 30), (3, "c", -1)).toDF("id", "name", "age")
    val exps = Seq(Expectations.drop("age_nonneg", col("age") >= 0))
    Expectations.appendChecked(spark, root, good, exps)
    val (v2, c2) = Expectations.appendChecked(spark, root, mixed, exps)
    assert(v2 == 2L && c2 == Map("rows_in" -> 2L, "age_nonneg" -> 1L))
    assert(SnapshotLog.read(spark, root).select("id").as[Int].collect().toSet ==
      Set(1, 2))
    assert(Expectations.audit(spark, root, 1L).contains(
      Map("rows_in" -> 1L, "age_nonneg" -> 0L)))
    // vacuum reclaims the audit with its version
    SnapshotLog.commit(spark, root, good)
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(Expectations.audit(spark, root, 1L).isEmpty)
    assert(Expectations.audit(spark, root, 2L).isEmpty)
  }

  test("empty batch commits cleanly with zero counts (sum over 0 rows is NULL)") {
    // a daily load with no new rows must not crash AFTER the commit
    // published — observe's sum() metrics come back SQL NULL on an
    // empty scan and must read as 0
    val root = freshRoot()
    val (v, counts) = Expectations.commitChecked(spark, root,
      batch.filter(lit(false)), Seq(
        Expectations.warn("age_nonneg", col("age") >= 0),
        Expectations.drop("name_present", col("name").isNotNull)))
    assert(v == 1L)
    assert(counts == Map("rows_in" -> 0L, "age_nonneg" -> 0L,
      "name_present" -> 0L))
    assert(SnapshotLog.read(spark, root).count() == 0)
    assert(Expectations.audit(spark, root, 1L).contains(counts))
  }

  test("misuse fails loudly: duplicate names, reserved name, empty set") {
    intercept[IllegalArgumentException] {
      Expectations.gate(batch, Seq(
        Expectations.warn("x", lit(true)), Expectations.warn("x", lit(false))))
    }
    intercept[IllegalArgumentException] {
      Expectations.gate(batch, Seq(Expectations.warn("rows_in", lit(true))))
    }
    intercept[IllegalArgumentException] {
      Expectations.gate(batch, Seq.empty)
    }
  }
}
