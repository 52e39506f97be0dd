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

  test("orc round-trip preserves values; predicates and pruning reach the ORC scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val orig = Tables.orders(spark, sf0001)
    Sources.writeOrc(orig, s"$dir/orders_orc")
    val back = Sources.readOrc(spark, s"$dir/orders_orc")
    assert(back.count() == orig.count())
    val q = back.filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey", "o_totalprice")
    val scan = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata.get("PushedFilters").exists(_.contains("GreaterThan")),
      scan.metadata.toString)
    assert(scan.requiredSchema.fieldNames.toSet == Set("o_orderkey", "o_totalprice"))
    val a = orig.filter(col("o_totalprice") > 300000.0).count()
    assert(q.count() == a)
  }

  test("binaryFile source yields (path, length, content) rows; glob filters by extension") {
    val dir = Files.createTempDirectory("graft_bin").toString
    val payload = Array[Byte](0x7f, 0x45, 0x4c, 0x46, 0, 1, 2, 3)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.img"), payload)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.img"), payload.map(b => (b + 1).toByte))
    Files.writeString(java.nio.file.Paths.get(s"$dir/skip.txt"), "not media")
    val df = Sources.readBinaryFiles(spark, dir, Some("*.img"))
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df.orderBy("path").collect()
    assert(rows.length == 2, rows.mkString(","))
    assert(rows(0).getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    assert(rows(0).getAs[Long]("length") == payload.length)
  }

  test("writeRangeClustered produces disjoint per-file key ranges (data-skipping layout)") {
    val dir = Files.createTempDirectory("graft_cluster").toString
    val orders = Tables.orders(spark, sf0001)
    graft.sources.Layout.writeRangeClustered(orders, s"$dir/clustered", "o_orderkey", 8)
    val perFile = spark.read.parquet(s"$dir/clustered")
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"),
           count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perFile.length == 8, s"expected 8 files, got ${perFile.length}")
    // disjoint ranges: each file's max < next file's min — the property
    // parquet min/max stats need to skip whole files on a range predicate
    perFile.sliding(2).foreach { case Array((_, hi1, _), (lo2, _, _)) =>
      assert(hi1 < lo2, perFile.mkString(","))
    }
    // lossless
    assert(perFile.map(_._3).sum == orders.count())
  }

  test("compactParquet merges a many-small-files dataset to near-target file count") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val orig = Tables.lineitem(spark, sf0001)
    // fragment: 64 tiny files
    orig.repartition(64).write.parquet(s"$dir/frag")
    val fragFiles = new java.io.File(s"$dir/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 64)
    val fragBytes = new java.io.File(s"$dir/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target ~ half the total → expect 2 output files
    val (before, planned) = graft.sources.Layout.compactParquet(
      spark, s"$dir/frag", s"$dir/compact", targetBytes = fragBytes / 2)
    assert(before == 64 && planned == 2, s"$before -> $planned")
    val outFiles = new java.io.File(s"$dir/compact").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 2, s"wrote $outFiles files")
    // lossless
    val a = spark.read.parquet(s"$dir/compact").count()
    assert(a == orig.count())
  }
}
