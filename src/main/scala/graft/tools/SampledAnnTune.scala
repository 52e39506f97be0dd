package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{EmbedOps, Tables}

/** Operating-point sweep for the sample-trained IVF-PQ build: recall@10
  * over the 5 standard query ids vs the exact top-10, across Lloyd
  * iteration counts and PQ codebook sizes, against the full-scan build's
  * measured 39/50 at (cellIters=2, pqIters=3). Run:
  *   sbt -batch "runMain graft.tools.SampledAnnTune"
  */
object SampledAnnTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queryIds = Seq(7L, 123L, 250L, 401L, 499L)
    val truths = queryIds.map { qid =>
      val q = corpus.filter(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0)
      (qid, q, EmbedOps.knnBruteForce(corpus, q, 10)
        .collect().map(_.getLong(0)).toSet)
    }
    val n = corpus.count().toDouble
    def measure(tag: String, encoded: org.apache.spark.sql.DataFrame,
                index: EmbedOps.IvfPqIndex): Unit = {
      val enc = encoded.persist()
      val cellSizes = enc.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      var hits = 0; var scanned = 0L; var inCells = 0
      truths.foreach { case (qid, q, truth) =>
        val res = EmbedOps.knnIvfPq(enc, index, q, topK = 10,
          nprobe = 6, shortlist = 100).collect().map(_.getLong(0)).toSet
        hits += (res intersect truth).size
        val qd = q.map(_.toDouble).toArray
        val probed = index.cells.zipWithIndex
          .map { case (c, i) => (c.zip(qd).map { case (a, b) => a * b }.sum, i) }
          .sortBy(-_._1).take(6).map(_._2)
        scanned += probed.map(c => cellSizes.getOrElse(c, 0L)).sum
        inCells += enc.filter(col("cell").isin(probed: _*) &&
          col("vec_id").isin(truth.toSeq: _*)).count().toInt
      }
      enc.unpersist()
      println(f"TUNE $tag recall=$hits/50 cellCeil=$inCells/50 " +
        f"scanned=${scanned / (5 * n)}%.3f of corpus")
    }
    val (ef, ixf) = EmbedOps.ivfPqBuild(corpus, kCells = 16, m = 8, kPq = 32,
      cellIters = 2, pqIters = 3)
    measure("full      ", ef, ixf)
    for (ci <- Seq(2, 8)) {
      val (es, ixs) = EmbedOps.ivfPqBuildSampled(corpus, kCells = 16, m = 8,
        kPq = 32, cellIters = ci, pqIters = 8, maxTrain = 1024)
      measure(s"sampled i$ci", es, ixs)
    }
    spark.stop()
  }
}
