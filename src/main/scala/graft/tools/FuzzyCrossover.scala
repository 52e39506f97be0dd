package graft.tools
import org.apache.spark.sql.SparkSession

/** Scaling probe for the q66/x66 pair: times both at two scale factors
  * and prints the growth ratio of each. The brute blocked join's work
  * grows ~quadratically (fixed-cardinality brand blocks); the prefix
  * twin's grows with candidate-bucket sizes (token rarity). Run:
  * `sbt "runMain graft.tools.FuzzyCrossover"`.
  */
object FuzzyCrossover {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val rows = sfs.map { dir =>
      import org.apache.spark.sql.functions.col
      // x66 dispatches to brute below the crossover (round 14), so the
      // prefix path is timed FORCED — that growth curve is what the
      // crossover is about; dispatched x66 is timed too (the user cost)
      def parts = graft.engine.Tables.part(spark, dir).select(
        col("p_partkey").as("id"), col("p_name").as("name"),
        col("p_brand").as("block"))
      // min-of-2 per the bench convention
      val q = (1 to 2).map(_ => time(graft.engine.Scalars.q66(spark, dir).count())).minBy(_._1)
      val x = (1 to 2).map(_ => time(graft.engine.Scalars.x66(spark, dir).count())).minBy(_._1)
      val p = (1 to 2).map(_ => time(
        graft.engine.Scalars.fuzzyMatchPrefix(parts, bruteBelow = 0).count())).minBy(_._1)
      println(f"$dir%s q66=${q._1}%.2fs/${q._2} pairs x66(dispatched)=${x._1}%.2fs " +
        f"prefix(forced)=${p._1}%.2fs/${p._2} pairs")
      (q._1, p._1)
    }
    println(f"growth q66 ${rows(1)._1 / rows(0)._1}%.1fx prefix ${rows(1)._2 / rows(0)._2}%.1fx")
    spark.stop()
  }
}
