package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.Scd2

/** SCD2 history merge: versions open and close on change, re-applies are
  * no-ops, point-in-time views reconstruct any past snapshot.
  */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val t1 = ts("2026-01-01 00:00:00")
  private val t2 = ts("2026-02-01 00:00:00")
  private val t3 = ts("2026-03-01 00:00:00")

  test("open, close-on-change, no-op on identical, point-in-time views") {
    val v1 = Seq((1L, "intro", 3.0), (2L, "algo", 4.0)).toDF("course_id", "title", "credits")
    val h1 = Scd2.merge(Scd2.emptyHistory(v1), v1, Seq("course_id"), t1)
    assert(h1.count() == 2 && h1.filter(col("is_current")).count() == 2)

    // v2: course 1 changes credits, course 2 identical, course 3 appears
    val v2 = Seq((1L, "intro", 4.0), (2L, "algo", 4.0), (3L, "ml", 3.0))
      .toDF("course_id", "title", "credits")
    val h2 = Scd2.merge(h1, v2, Seq("course_id"), t2)
    assert(h2.count() == 4, h2.collect().mkString("\n"))
    val cur2 = Scd2.current(h2).orderBy("course_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(cur2.toSeq == Seq((1L, 4.0), (2L, 4.0), (3L, 3.0)))
    // course 1's old version closed at t2
    val closed = h2.filter(!col("is_current")).collect()
    assert(closed.length == 1)
    assert(closed.head.getLong(0) == 1L &&
      closed.head.getAs[Timestamp]("valid_to") == t2)

    // idempotent: re-applying v2 changes nothing
    val h2b = Scd2.merge(h2, v2, Seq("course_id"), t3)
    assert(h2b.count() == h2.count())
    assert(h2b.filter(!col("is_current")).count() == 1)

    // point-in-time: at t1+ε course 1 had 3.0 credits and course 3 absent
    val at1 = Scd2.asOf(h2, ts("2026-01-15 00:00:00")).orderBy("course_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(at1.toSeq == Seq((1L, 3.0), (2L, 4.0)))
    val at2 = Scd2.asOf(h2, ts("2026-02-15 00:00:00")).orderBy("course_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(at2.toSeq == Seq((1L, 4.0), (2L, 4.0), (3L, 3.0)))
  }

  test("null transitions count as changes, null-safe both directions") {
    val v1 = Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("id", "note")
    val h1 = Scd2.merge(Scd2.emptyHistory(v1), v1, Seq("id"), t1)
    // value→null and null→value both open new versions
    val v2 = Seq((1L, Option.empty[String]), (2L, Some("y"))).toDF("id", "note")
    val h2 = Scd2.merge(h1, v2, Seq("id"), t2)
    assert(h2.count() == 4)
    assert(h2.filter(col("is_current")).count() == 2)
    val cur = Scd2.current(h2).orderBy("id").collect()
    assert(cur(0).isNullAt(1) && cur(1).getString(1) == "y")
  }

  test("keys absent from the batch are untouched (deletions are deleteByKey's job)") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val h1 = Scd2.merge(Scd2.emptyHistory(v1), v1, Seq("id"), t1)
    val v2 = Seq((1L, "a2")).toDF("id", "v")
    val h2 = Scd2.merge(h1, v2, Seq("id"), t2)
    val cur = Scd2.current(h2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(cur.toSeq == Seq((1L, "a2"), (2L, "b")))
  }

  test("duplicate batch keys raise at execution instead of fanning out versions") {
    val v1 = Seq((1L, "intro", 3.0)).toDF("course_id", "title", "credits")
    val h1 = Scd2.merge(Scd2.emptyHistory(v1), v1, Seq("course_id"), t1)
    val dup = Seq((1L, "intro", 4.0), (1L, "intro-dup", 5.0))
      .toDF("course_id", "title", "credits")
    val e = intercept[Exception] {
      Scd2.merge(h1, dup, Seq("course_id"), t2).count()
    }
    // the raise_error message survives Spark's execution-exception wrapping
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("multiple rows for key")), e.toString)
    // a duplicate-free batch with the same shape still merges fine
    val ok = Scd2.merge(h1, Seq((1L, "intro", 4.0)).toDF("course_id", "title", "credits"),
      Seq("course_id"), t2)
    assert(ok.count() == 2)
  }

  test("schema mismatch and missing meta columns fail fast") {
    val v = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Scd2.merge(v, v, Seq("id"), t1)  // history lacks meta columns
    }
    val badBatch = Seq((1L, "a", 1.0)).toDF("id", "v", "extra")
    intercept[IllegalArgumentException] {
      Scd2.merge(Scd2.emptyHistory(v), badBatch, Seq("id"), t1)
    }
  }
}
