// Scratch profiler for the range-join skew crossover (bench tuning): a
// synthetic hot user whose whole history lands on ONE reducer under the
// plain (user_id)-keyed band join, vs the banded (user_id, time-bucket)
// rewrite that spreads it across buckets. Writes under /tmp only.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // hot user 0: 40k events at 30 s spacing (≈10 events per 5-min band →
    // bounded true output, but 8·10⁸ same-key pair probes for the plain
    // join, all on one task). 1000 cold users × 100 events as background.
    // Double the hot history and the plain join quadruples; the banded one
    // doubles — the crossover only widens.
    val hot = spark.range(40000).select(
      (col("id") + 1000000L).as("event_id"),
      lit(0L).as("user_id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 30).as("ts"))
    val cold = spark.range(100000).select(
      col("id").as("event_id"),
      (col("id") % 1000L + 1L).as("user_id"),
      timestamp_seconds(lit(1700000000L) + (col("id") / 1000L) * 37).as("ts"))
    val path = "/tmp/skew_events"
    hot.unionByName(cold).write.mode("overwrite").parquet(path)
    val e = spark.read.parquet(path)
    println(s"rows = ${e.count()} (hot user = 40000)")

    def plain() = {
      val a = e.select(col("event_id").as("id_a"), col("ts").as("ts_a"), col("user_id"))
      val b = e.select(col("event_id").as("id_b"), col("ts").as("ts_b"),
        col("user_id").as("user_b"))
      a.join(b, col("user_id") === col("user_b") &&
        col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL '5' MINUTE") &&
        col("id_a") < col("id_b"))
    }
    // the library implementation under test (its presentation sort and
    // delta_s projection are optimized away under count(), so the timing
    // isolates the join itself — same as the plain side)
    def banded() = graft.engine.Relational.bandedRangeJoin(e)
    val nB = time("banded (user, 5-min bucket) join") { banded().count() }
    val nP = time("plain (user)-keyed band join") { plain().count() }
    println(s"pairs: banded = $nB, plain = $nP, equal = ${nB == nP}")
    spark.stop()
  }
}
