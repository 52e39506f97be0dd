package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.sources.Sources

/** Ingestion-edge coverage: typed CSV round-trip, JSONL with explicit
  * schema, latest-dated-generation selection (SURVEY §2.2).
  */
class SourcesSpec extends SparkSpecBase {

  test("csv round-trip preserves schema and values (header + FAILFAST)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val orig = Tables.customer(spark, sf0001)
    Sources.writeCsv(orig, s"$dir/customer_csv")
    val back = Sources.readCsv(spark, s"$dir/customer_csv", orig.schema)
    assert(back.schema == orig.schema)
    val a = orig.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a == b)
  }

  test("csv FAILFAST raises on malformed rows; PERMISSIVE nulls them") {
    val dir = Files.createTempDirectory("graft_badcsv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", IntegerType)))
    intercept[org.apache.spark.SparkException] {
      Sources.readCsv(spark, s"$dir/bad.csv", schema).collect()
    }
    val permissive = Sources.readCsv(spark, s"$dir/bad.csv", schema, mode = "PERMISSIVE")
    assert(permissive.count() == 3)
    assert(permissive.filter(col("qty").isNull).count() == 1)
  }

  test("jsonl reads with explicit schema") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"id": 1, "name": "x", "extra": true}
        |{"id": 2, "name": "y"}
        |{"id": 3}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.readJsonl(spark, s"$dir/a.jsonl", schema)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.count() == 3)
    assert(df.filter(col("name").isNull).count() == 1)
  }

  test("latestGeneration picks the newest dated export") {
    val dir = Files.createTempDirectory("graft_gen").toString
    Seq("QUERY-20250101.csv", "QUERY-20250410.csv", "QUERY-20241231.csv", "OTHER-20990101.txt")
      .foreach(n => Files.writeString(java.nio.file.Paths.get(s"$dir/$n"), "x\n1\n"))
    val picked = Sources.latestGeneration(spark, dir, raw"QUERY-(\d{8})\.csv")
    assert(picked.exists(_.endsWith("QUERY-20250410.csv")), picked.toString)
    assert(Sources.latestGeneration(spark, dir, raw"NOPE-(\d{8})\.csv").isEmpty)
  }
}
