package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AnnIndex
import graft.sources.SnapshotLog

/** Measured facts for SDC NEAR-DUP over an ivfpq index (round 16):
  * [[AnnIndex.nearDupPairsPq]] generates candidates from CODES ONLY
  * (m bytes/vector read) and exact-verifies the band against the
  * table. Compared against [[AnnIndex.nearDupPairs]] on a float (ivf)
  * index built with the SAME deterministic trainer — identical coarse
  * cells — so the pair-set difference isolates the SDC margin loss
  * from the shared Voronoi-boundary loss.
  *
  * Run: `sbt "runMain graft.tools.NearDupPqBench [rows] [dim] [thr] [margin]"`.
  */
object NearDupPqBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val rows = args.headOption.map(_.toInt).getOrElse(40000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val thr = args.drop(2).headOption.map(_.toDouble).getOrElse(0.9995)
    val margin = args.drop(3).headOption.map(_.toDouble).getOrElse(0.05)
    val root = java.nio.file.Files
      .createTempDirectory("graft_sdcbench").toString + "/emb"

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // UNIT-NORM tie-dense manifold (near-dup thresholds assume cosine)
    val raw = spark.range(0, rows.toLong).toDF("vec_id")
      .withColumn("__r", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(vec_id * 0.7 + d * 1.3) AS FLOAT))"))
    val corpus = raw.withColumn("__n",
        sqrt(expr("aggregate(__r, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)")))
      .withColumn("embedding",
        expr("transform(__r, x -> CAST(x / __n AS FLOAT))"))
      .select("vec_id", "embedding").repartition(8)
    SnapshotLog.commit(spark, root, corpus, statsCols = Seq("vec_id"))
    AnnIndex.build(spark, root, k = 64, maxTrain = 8192)
    AnnIndex.buildPq(spark, root, "ivfpq", kCells = 64, m = 8, kPq = 256,
      maxTrain = 8192)

    val (ivfPairs, tIvf) = time {
      AnnIndex.nearDupPairs(spark, root, thr)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (pqPairs, tPq) = time {
      AnnIndex.nearDupPairsPq(spark, root, thr, margin)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall =
      if (ivfPairs.isEmpty) 1.0
      else pqPairs.intersect(ivfPairs).size.toDouble / ivfPairs.size
    println(f"[sdcbench] corpus=$rows dim=$dim thr=$thr margin=$margin nlist=64")
    println(f"[sdcbench] ivf float pairs: ${ivfPairs.size} in $tIvf%.1f s; " +
      f"ivfpq SDC pairs: ${pqPairs.size} in $tPq%.1f s")
    println(f"[sdcbench] SDC recall vs float same-cell: $recall%.3f " +
      f"(false positives: ${(pqPairs -- ivfPairs).size} — must be 0)")
    spark.stop()
  }
}
