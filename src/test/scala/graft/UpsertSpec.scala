package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Upsert

/** Upsert algebra (SURVEY §5.2.3): identity on empty batch, last-writer-
  * wins, insert-new-keys, idempotence.
  */
class UpsertSpec extends SparkSpecBase {
  import spark.implicits._

  private def tbl(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "name", "bal")

  private def sorted(df: DataFrame) = df.orderBy("id").collect().toSeq

  test("upsert with empty batch is identity") {
    val a = tbl((1L, "a", 1.0), (2L, "b", 2.0))
    val empty = tbl().limit(0)
    assert(sorted(Upsert.upsert(a, empty, Seq("id"))) == sorted(a))
  }

  test("batch wins on conflicting key; unmatched rows survive both sides") {
    val a = tbl((1L, "a", 1.0), (2L, "b", 2.0))
    val b = tbl((2L, "B2", 20.0), (3L, "c", 3.0))
    val out = sorted(Upsert.upsert(a, b, Seq("id")))
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))) ==
      Seq((1L, "a", 1.0), (2L, "B2", 20.0), (3L, "c", 3.0)))
  }

  test("batch null non-key columns overwrite (batch row wins wholesale)") {
    val a = tbl((1L, "a", 1.0))
    val b = Seq((1L, null.asInstanceOf[String], 9.0)).toDF("id", "name", "bal")
    val out = sorted(Upsert.upsert(a, b, Seq("id")))
    assert(out.head.isNullAt(1) && out.head.getDouble(2) == 9.0)
  }

  test("idempotence: applying the same batch twice equals once") {
    val a = tbl((1L, "a", 1.0), (2L, "b", 2.0))
    val b = tbl((2L, "B", 20.0), (3L, "c", 3.0))
    val once = Upsert.upsert(a, b, Seq("id"))
    val twice = Upsert.upsert(once, b, Seq("id"))
    assert(sorted(once) == sorted(twice))
  }

  test("composite keys merge on the full tuple") {
    val a = Seq((1L, 1, "x"), (1L, 2, "y")).toDF("k1", "k2", "v")
    val b = Seq((1L, 2, "Y"), (2L, 1, "z")).toDF("k1", "k2", "v")
    val out = Upsert.upsert(a, b, Seq("k1", "k2")).orderBy("k1", "k2").collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2))) ==
      Seq((1L, 1, "x"), (1L, 2, "Y"), (2L, 1, "z")))
  }

  test("schema mismatch is rejected") {
    val a = tbl((1L, "a", 1.0))
    val b = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] { Upsert.upsert(a, b, Seq("id")) }
  }
}
