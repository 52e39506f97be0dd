package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q39's cost structure (scan vs json vs agg). */
object ProfileQ39 {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.engine.Tables.events(spark, dir)
    time("warmup count")(ev.count())
    time("scan only (props,event_type)")(
      ev.select("props", "event_type").groupBy("event_type").count().count())
    time("get_json_object + agg (q39 shape)")(
      graft.engine.Scalars.q39(spark, dir).count())
    time("get_json_object alone")(
      ev.select(get_json_object(col("props"), "$.k").as("k")).filter(col("k").isNotNull).count())
    time("from_json struct alone")(
      ev.select(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        .filter(col("k").isNotNull).count())
    time("q39 via from_json")(
      ev.withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), min("k").as("min_k"),
             max("k").as("max_k"), round(avg("k"), 6).as("avg_k"))
        .orderBy("event_type").count())
    time("q39 again (warm)")(graft.engine.Scalars.q39(spark, dir).count())
    spark.stop()
  }
}
