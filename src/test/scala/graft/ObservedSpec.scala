package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Observed, SnapshotLog}

/** Single-pass write metrics: the observe()/CollectMetrics sink audit.
  * The whole point is ONE scan — the metrics ride the write job — so the
  * spec checks the values AND that no second job re-read the input.
  */
class ObservedSpec extends SparkSpecBase {
  import spark.implicits._

  test("writeParquetWithMetrics: counts/sums/null-counts ride the write job") {
    val dir = Files.createTempDirectory("graft_obs").toString + "/out"
    val df = Seq((1L, 10.0), (2L, 2.5), (3L, 7.5)).toDF("id", "v")
      .withColumn("v", when(col("id") === 2L, lit(null).cast("double")).otherwise(col("v")))
    val m = Observed.writeParquetWithMetrics(df, dir,
      count(lit(1)).as("rows"),
      sum("v").as("total"),
      count(lit(1)).minus(count(col("v"))).as("null_vs"))
    assert(m.getAs[Long]("rows") == 3L, m.toString)
    assert(m.getAs[Double]("total") == 17.5, m.toString)
    assert(m.getAs[Long]("null_vs") == 1L, m.toString)
    // the data actually landed, matching the metrics
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("metrics cost no second scan: exactly one job reads the source") {
    // count the scans the hard way — a spy accumulator bumped per
    // partition of the source; one write pass = one bump per partition
    val acc = spark.sparkContext.longAccumulator("src_reads")
    val src = spark.range(0, 1000, 1, 4).toDF("id")
      .mapPartitions { it => acc.add(1); it }(
        org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType)))))
    val dir = Files.createTempDirectory("graft_obs1").toString + "/out"
    val m = Observed.writeParquetWithMetrics(src, dir,
      count(lit(1)).as("rows"), sum("id").as("total"))
    assert(m.getAs[Long]("rows") == 1000L)
    assert(m.getAs[Long]("total") == 999L * 1000 / 2)
    assert(acc.value == 4L,
      s"expected one pass over 4 partitions, saw ${acc.value} partition reads")
  }

  test("commitWithMetrics: audit + versioned commit + skipping stats in one pass") {
    val root = Files.createTempDirectory("graft_obs2").toString + "/table"
    val df = spark.range(100).toDF("id").withColumn("v", col("id") * 2)
    val (v, m) = Observed.commitWithMetrics(spark, root, df,
      Seq(count(lit(1)).as("rows"), max("v").as("max_v")),
      statsCols = Seq("id"))
    assert(v == 1L)
    assert(m.getAs[Long]("rows") == 100L && m.getAs[Long]("max_v") == 198L)
    assert(SnapshotLog.readBetween(spark, root, "id", 0, 10).count() == 11)
  }
}
