package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Measured fact for the round-11 restatement verbs: grow a scoped
  * table to nParts partitions, then restate ONE partition per batch
  * three ways —
  *
  *  - `overwritePartitions` (dynamic partition overwrite): replaces
  *    the touched leaf wholesale, reads ZERO pre-existing bytes;
  *  - `upsertScoped` (keyed merge): reads + merges the touched leaf;
  *  - full `commit` (snapshot replace): rewrites the table per batch.
  *
  * The overwrite path should track the BATCH with no read component at
  * all, the scoped merge adds the touched-leaf read+merge, and the
  * full rewrite grows with the TABLE. A fourth series measures flat
  * `replaceWhere` (positions + batch) against the copy-on-write
  * equivalent (filter + union + commit) at the same slice size.
  * Run: `sbt "runMain graft.tools.RestatementBench [nParts] [rowsPerPart]"`.
  */
object RestatementBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nParts = args.headOption.map(_.toInt).getOrElse(12)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val base = java.nio.file.Files.createTempDirectory("graft_restate").toString

    def seed(p: Int) = spark.range(p.toLong * rows, (p + 1L) * rows)
      .toDF("k").withColumn("p", lit(p))
      .withColumn("v", md5(col("k").cast("string")))
    def restate(p: Int) = spark.range(p.toLong * rows, (p + 1L) * rows)
      .toDF("k").withColumn("p", lit(p))
      .withColumn("v", md5(concat(lit("r"), col("k").cast("string"))))

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def drive(label: String, seedF: Int => Unit,
              f: Int => Unit): (Double, Double) = {
      val times = (0 until nParts).map { p =>
        seedF(p)
        val t0 = System.nanoTime(); f(p); (System.nanoTime() - t0) / 1e9
      }
      val early = median(times.slice(2, 6))
      val late = median(times.takeRight(4))
      println(f"$label%-12s early-median=$early%.2fs late-median=$late%.2fs " +
        f"growth=${late / early}%.1fx  " + times.map(t => f"$t%.2f").mkString(" "))
      (early, late)
    }

    val (oe, ol) = drive("overwrite",
      p => SnapshotLog.upsertScoped(spark, s"$base/ow", seed(p), Seq("k"), "p"),
      p => SnapshotLog.overwritePartitions(spark, s"$base/ow", restate(p), "p"))
    val (se, sl) = drive("scoped",
      p => SnapshotLog.upsertScoped(spark, s"$base/sc", seed(p), Seq("k"), "p"),
      p => SnapshotLog.upsertScoped(spark, s"$base/sc", restate(p), Seq("k"), "p"))
    val (fe, fl) = drive("rewrite",
      p => SnapshotLog.upsert(spark, s"$base/rw", seed(p), Seq("k")),
      p => SnapshotLog.upsert(spark, s"$base/rw", restate(p), Seq("k")))

    // identical final contents across the three strategies
    val a = SnapshotLog.read(spark, s"$base/ow")
    val b = SnapshotLog.read(spark, s"$base/sc")
    val c = SnapshotLog.read(spark, s"$base/rw")
    require(a.exceptAll(b).count() + b.exceptAll(a).count() == 0, "ow != sc")
    require(a.exceptAll(c).count() + c.exceptAll(a).count() == 0, "ow != rw")

    // flat replaceWhere vs copy-on-write at the same slice size; the
    // seeds declare span stats on the slice column (the production
    // `graft.statsCols` configuration) so the position scan prunes to
    // the matched files instead of scanning the table
    val rwRoot = s"$base/flat_rw"; val cowRoot = s"$base/flat_cow"
    (0 until nParts).foreach { p =>
      SnapshotLog.appendCommit(spark, rwRoot, seed(p), statsCols = Seq("p"))
      SnapshotLog.appendCommit(spark, cowRoot, seed(p), statsCols = Seq("p"))
    }
    val slice = nParts / 2
    val t0 = System.nanoTime()
    SnapshotLog.replaceWhere(spark, rwRoot, restate(slice),
      df => df("p") === slice)
    val tRw = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    SnapshotLog.commit(spark, cowRoot,
      SnapshotLog.read(spark, cowRoot).filter(col("p") =!= slice)
        .unionByName(restate(slice)))
    val tCow = (System.nanoTime() - t1) / 1e9
    val x = SnapshotLog.read(spark, rwRoot)
    val y = SnapshotLog.read(spark, cowRoot)
    require(x.exceptAll(y).count() + y.exceptAll(x).count() == 0, "rw != cow")
    println(f"replaceWhere=$tRw%.2fs copy-on-write=$tCow%.2fs " +
      f"(one slice of $nParts on a ${nParts.toLong * rows} row table)")

    println(f"VERDICT restating one partition of $nParts: overwrite " +
      f"late-median $ol%.2fs (growth ${ol / oe}%.1fx), scoped merge " +
      f"$sl%.2fs (${sl / se}%.1fx), full rewrite $fl%.2fs (${fl / fe}%.1fx); " +
      f"flat replaceWhere $tRw%.2fs vs copy-on-write $tCow%.2fs")
    spark.stop()
  }
}
