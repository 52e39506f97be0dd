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

  test("deleteByKey removes matched keys, keeps the rest, null-safe, extra cols ignored") {
    val snap = tbl((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val tomb = Seq((2L, "ignored"), (9L, "missing")).toDF("id", "junk")
    val out = Upsert.deleteByKey(snap, tomb, Seq("id"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L))
    // delete then upsert round-trip: reinsert converges
    val back = Upsert.upsert(Upsert.deleteByKey(snap, tomb, Seq("id")),
      tbl((2L, "b", 2.0)), Seq("id"))
    assert(back.count() == 3)
    // composite + null-safe: a null key matches a null tombstone key
    val snapN = Seq((Some(1L), "x"), (None, "y")).toDF("k", "v")
    val tombN = Seq(Option.empty[Long]).toDF("k")
    val keptN = Upsert.deleteByKey(snapN, tombN, Seq("k")).collect()
    assert(keptN.length == 1 && keptN.head.getString(1) == "x")
  }

  test("upsertPartitioned rewrites only touched partitions; result ≡ full upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psu").toString + "/table"
    val snap = Seq(
      (1L, "a", 1.0, 1), (2L, "b", 2.0, 1),   // day 1
      (3L, "c", 3.0, 2), (4L, "d", 4.0, 2),   // day 2
      (5L, "e", 5.0, 3)                       // day 3
    ).toDF("id", "name", "bal", "day")
    snap.repartition(1).write.partitionBy("day").parquet(dir)

    def files(day: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.lastModified(), f.length())).toMap
    }
    val (d1Before, d3Before) = (files(1), files(3))

    // batch: update key 3 (day 2), insert key 6 (day 2), open day 4
    val batch = Seq((3L, "C3", 30.0, 2), (6L, "f", 6.0, 2), (7L, "g", 7.0, 4))
      .toDF("id", "name", "bal", "day")
    Upsert.upsertPartitioned(spark, dir, batch, Seq("id"), "day")

    // result must equal the full-snapshot upsert of the same batch
    val got = spark.read.parquet(dir)
      .select("id", "name", "bal", "day").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSeq
    val want = Upsert.upsert(snap, batch, Seq("id")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")

    // untouched day=1 / day=3 files: same names, mtimes, and sizes
    assert(files(1) == d1Before, "day=1 was rewritten")
    assert(files(3) == d3Before, "day=3 was rewritten")
    // day=2 was rewritten, day=4 created
    assert(new java.io.File(s"$dir/day=4").exists())
    // the staging directory is transient: removed once the overwrite lands
    assert(!new java.io.File(dir + "_graft_staging").exists(),
      "staging dir leaked")

    // empty batch: no-op, nothing rewritten anywhere
    val d2After = files(2)
    Upsert.upsertPartitioned(spark, dir, batch.limit(0), Seq("id"), "day")
    assert(files(2) == d2After)
  }

  test("upsertPartitioned: trailing-slash path stages BESIDE the table; existing staging fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psu_slash").toString + "/table"
    val snap = Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "name", "day")
    snap.repartition(1).write.partitionBy("day").parquet(dir)
    val batch = Seq((1L, "A", 1)).toDF("id", "name", "day")
    // trailing slashes (even repeated) must not nest the staging dir
    // inside the table — an in-table _graft_staging leftover would be
    // invisible to Spark listings (underscore prefix) but still rot
    Upsert.upsertPartitioned(spark, dir + "//", batch, Seq("id"), "day")
    assert(!new java.io.File(dir + "/_graft_staging").exists(),
      "staging dir nested inside the table directory")
    assert(!new java.io.File(dir + "_graft_staging").exists(), "staging dir leaked")
    assert(!new java.io.File(dir + "_graft_staging_claim").exists(), "claim leaked")
    val got = spark.read.parquet(dir).select("id", "name").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "A"), (2L, "b")), got.toString)
    // a surviving claim file = concurrent writer or hard-crash leftover:
    // fail fast instead of interleaving with another writer's staged data
    new java.io.File(dir + "_graft_staging_claim").createNewFile()
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertPartitioned(spark, dir, batch, Seq("id"), "day")
    }
    assert(e.getMessage.contains("claim"), e.getMessage)
  }

  test("upsertPartitioned merges (not replaces) the null partition") {
    // isin(null) never matches — without the isNull pruning branch a
    // null-day batch row would silently DROP pre-existing null-day rows
    val dir = java.nio.file.Files.createTempDirectory("graft_psu_null").toString + "/t"
    val snap = Seq[(Long, String, Option[Int])](
        (1L, "a", Some(1)), (2L, "b", None), (3L, "c", None))
      .toDF("id", "v", "day")
    snap.write.partitionBy("day").parquet(dir)
    val batch = Seq[(Long, String, Option[Int])]((3L, "C", None), (4L, "d", None))
      .toDF("id", "v", "day")
    Upsert.upsertPartitioned(spark, dir, batch, Seq("id"), "day")
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // 2 must SURVIVE: it lives in the null partition the batch touched
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "C"), (4L, "d")), got.toString)
  }

  test("parquet schema evolution: mergeSchema unifies old and new generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // generation 1: two columns; generation 2 adds a nullable column
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/gen=2")
    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.schema.fieldNames.toSet == Set("id", "name", "score", "gen"))
    val rows = unified.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")), "old rows null-fill new cols")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }
}
