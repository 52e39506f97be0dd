package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured fact for partition-scoped keyed upserts (round-6 VERDICT
  * item 1): grow two snapshot-log tables partition by partition, then
  * drive N single-partition keyed update batches into each — one
  * through the full-snapshot `upsert` (rewrites the table per batch),
  * one through `upsertScoped` (rewrites only the touched partition).
  * The rewrite path's cost grows with the TABLE; the scoped path's cost
  * tracks the BATCH — the difference between a daily keyed batch on a
  * 100 TB table costing one partition or costing 100 TB.
  * Run: `sbt "runMain graft.tools.ScopedBench [nParts] [rowsPerPart]"`.
  */
object ScopedBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nParts = args.headOption.map(_.toInt).getOrElse(12)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val base = java.nio.file.Files.createTempDirectory("graft_scopedbench").toString

    // partition p holds keys [p*rows, (p+1)*rows); an update batch
    // rewrites half of one existing partition's rows
    def seed(p: Int) = spark.range(p.toLong * rows, (p + 1L) * rows)
      .toDF("k").withColumn("p", lit(p))
      .withColumn("v", md5(col("k").cast("string")))
    def update(p: Int) = spark.range(p.toLong * rows, p.toLong * rows + rows / 2)
      .toDF("k").withColumn("p", lit(p))
      .withColumn("v", md5(concat(lit("u"), col("k").cast("string"))))

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def drive(label: String,
              f: (org.apache.spark.sql.DataFrame) => Unit): (Double, Double) = {
      // grow the table first: nParts partitions land before timing starts
      val times = (0 until nParts).map { p =>
        f(seed(p))
        val b = update(p)
        val t0 = System.nanoTime(); f(b); (System.nanoTime() - t0) / 1e9
      }
      val early = median(times.slice(2, 6))
      val late = median(times.takeRight(4))
      println(f"$label%-8s early-median=$early%.2fs late-median=$late%.2fs " +
        f"growth=${late / early}%.1fx  " + times.map(t => f"$t%.2f").mkString(" "))
      (early, late)
    }

    val (fe, fl) = drive("rewrite",
      b => SnapshotLog.upsert(spark, s"$base/rw", b, Seq("k")))
    val (se, sl) = drive("scoped",
      b => SnapshotLog.upsertScoped(spark, s"$base/sc", b, Seq("k"), "p"))

    // same table contents either way
    val a = SnapshotLog.read(spark, s"$base/sc")
    val r = SnapshotLog.read(spark, s"$base/rw")
    val diff = a.exceptAll(r).count() + r.exceptAll(a).count()
    require(diff == 0, s"content mismatch: $diff differing rows")
    println(f"VERDICT over $nParts single-partition update batches the " +
      f"full-rewrite upsert grew ${fl / fe}%.1fx while the scoped upsert " +
      f"grew ${sl / se}%.1fx (late medians ${fl}%.2fs vs ${sl}%.2fs)")
    spark.stop()
  }
}
