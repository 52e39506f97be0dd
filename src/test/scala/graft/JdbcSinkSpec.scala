package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JdbcSink

/** JDBC MERGE upsert against embedded Derby (ships in /opt/spark/jars) —
  * the reference's relational-sink shape: insert new keys, update changed
  * rows, leave the rest, converge under replay.
  */
class JdbcSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val dbDir = {
    System.setProperty("derby.system.home",
      Files.createTempDirectory("graft_derby_home").toString)
    Files.createTempDirectory("graft_derby").resolve("db")
  }
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private def readTable(table: String) = {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    spark.read.jdbc(url, table, props)
  }

  test("upsert: inserts, updates, and replay idempotency against Derby") {
    val v1 = Seq(
      (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)
    ).toDF("id", "name", "score")
    JdbcSink.ensureTable(url, "items", v1.schema, Seq("id"))
    JdbcSink.upsert(v1, url, "items", Seq("id"))
    val after1 = readTable("items").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(after1.toSeq == Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)))

    // v2: update id=2, insert id=4, leave 1 and 3 untouched
    val v2 = Seq((2L, "beta2", 22.0), (4L, "delta", 40.0)).toDF("id", "name", "score")
    JdbcSink.upsert(v2, url, "items", Seq("id"))
    val after2 = readTable("items").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(after2.toSeq == Seq(
      (1L, "alpha", 10.0), (2L, "beta2", 22.0), (3L, "gamma", 30.0), (4L, "delta", 40.0)))

    // replay the same batch (a retried task / rerun pipeline): state unchanged
    JdbcSink.upsert(v2, url, "items", Seq("id"))
    val after3 = readTable("items").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(after3.toSeq == after2.toSeq)
  }

  test("upsert handles NULLs, timestamps, and composite keys") {
    val schema = StructType(Seq(
      StructField("k1", LongType), StructField("k2", StringType),
      StructField("note", StringType), StructField("at", TimestampType)))
    val t0 = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    val rows = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, "a", null, t0),
        org.apache.spark.sql.Row(1L, "b", "x", null)),
      schema)
    JdbcSink.ensureTable(url, "composite", schema, Seq("k1", "k2"))
    JdbcSink.upsert(rows, url, "composite", Seq("k1", "k2"))
    val got = readTable("composite").orderBy("k2").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(2) && got(0).getTimestamp(3) == t0)
    assert(got(1).getString(2) == "x" && got(1).isNullAt(3))
    // update only the (1,a) row
    val upd = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "a", "filled", t0)), schema)
    JdbcSink.upsert(upd, url, "composite", Seq("k1", "k2"))
    val got2 = readTable("composite").orderBy("k2").collect()
    assert(got2(0).getString(2) == "filled")
    assert(got2(1).getString(2) == "x")
  }

  test("ensureTable is idempotent; unmappable column types fail fast") {
    val df = Seq((1L, "x")).toDF("id", "v")
    JdbcSink.ensureTable(url, "idem", df.schema, Seq("id"))
    JdbcSink.ensureTable(url, "idem", df.schema, Seq("id")) // no X0Y32 escape
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      JdbcSink.upsert(bad, url, "idem", Seq("id"))
    }
    assert(e.getMessage.contains("serialize"))
  }

  test("Postgres dialect generates conflict-target SQL with EXCLUDED updates") {
    val fields = Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))
    val sql = JdbcSink.PostgresOnConflict.upsertSql("t", fields, Seq("id"))
    assert(sql.contains("""INSERT INTO t ("id", "name", "score")"""))
    assert(sql.contains(
      """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "score" = EXCLUDED."score""""))
    val allKeys = JdbcSink.PostgresOnConflict.upsertSql("t",
      fields.take(1), Seq("id"))
    assert(allKeys.contains("DO NOTHING"))
  }

  test("update/insert plan quotes identifiers and degenerates safely on all-key schemas") {
    val fields = Seq(
      StructField("id", LongType), StructField("at", TimestampType))
    assert(JdbcSink.updateSql("t", fields, Seq("id")) ==
      """UPDATE t SET "at" = ? WHERE "id" = ?""")
    assert(JdbcSink.insertSql("t", fields) ==
      """INSERT INTO t ("id", "at") VALUES (?, ?)""")
    // every column a key: SET k = k keeps the hit-detection update valid
    assert(JdbcSink.updateSql("t", fields, Seq("id", "at")) ==
      """UPDATE t SET "id" = "id" WHERE "id" = ? AND "at" = ?""")
  }

  override def afterAll(): Unit = {
    // embedded Derby shuts down with an expected SQLException (08006)
    try DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    super.afterAll()
  }
}
