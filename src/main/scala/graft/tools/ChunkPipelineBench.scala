package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AnnIndex
import graft.sources.SnapshotLog

/** Measured fact for the ivfpq batch chunk pipeline (round 17 — verdict
  * r16 #3): the eager sequential chunk loop serialized "chunk N's codes
  * scan" behind "chunk N−1's shortlist collect"; the bounded-concurrency
  * pipeline (spark.graft.ann.batchChunkConcurrency, default 2) overlaps
  * them with memory bounded at concurrency × rerankBudget driver rows.
  *
  * This bench FORCES a multi-chunk run (rerank budget shrunk so the
  * batch splits into ~16 chunks — the shape the 65536-query ceiling
  * produces at default budgets) and times knnAll at concurrency 1
  * (the r16 sequential behavior) vs 2 vs 3 on the same session, plus a
  * result-identity check at the two settings.
  *
  * Run: `sbt "runMain graft.tools.ChunkPipelineBench [corpusRows] [dim] [Q]"`.
  */
object ChunkPipelineBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val rows = args.headOption.map(_.toInt).getOrElse(40000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val q = args.drop(2).headOption.map(_.toInt).getOrElse(4096)
    val root = java.nio.file.Files
      .createTempDirectory("graft_chunkpipe").toString + "/emb"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val corpus = spark.range(0, rows.toLong).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(vec_id * 0.7 + d * 1.3) AS FLOAT))"))
      .repartition(8)
    SnapshotLog.commit(spark, root, corpus, statsCols = Seq("vec_id"))
    AnnIndex.buildPq(spark, root, "ivfpq", kCells = 64, m = 8, kPq = 256,
      maxTrain = 8192)

    val queries = spark.range(0, q.toLong).toDF("qid")
      .withColumn("qvec", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(qid * 1.9 + d * 1.3) AS FLOAT))"))

    // shrink the rerank budget so the batch splits into ~16 chunks:
    // auto-shortlist = max(100, 3% of rows) per query, chunkCap =
    // rerankBudget / shortlist queries
    val shortlist = math.max(100L, math.ceil(rows * 0.03).toLong)
    spark.conf.set("spark.graft.ann.batchRerankRows",
      math.max(shortlist, q.toLong * shortlist / 16))

    // warm codegen/session
    AnnIndex.knnAll(spark, root, queries.limit(2), 10, "ivfpq").count()

    println(s"[chunkpipe] corpus=$rows dim=$dim Q=$q forced ~16 chunks")
    for (conc <- Seq(1, 2, 3)) {
      spark.conf.set("spark.graft.ann.batchChunkConcurrency", conc)
      val t = time {
        AnnIndex.knnAll(spark, root, queries, 10, "ivfpq").count()
      }
      println(f"[chunkpipe] concurrency=$conc: $t%.2f s")
    }
    // identity: sequential vs overlapped results are the same rows
    spark.conf.set("spark.graft.ann.batchChunkConcurrency", 1)
    val seq1 = AnnIndex.knnAll(spark, root, queries, 10, "ivfpq")
      .collect().toSeq
    spark.conf.set("spark.graft.ann.batchChunkConcurrency", 3)
    val par3 = AnnIndex.knnAll(spark, root, queries, 10, "ivfpq")
      .collect().toSeq
    println(s"[chunkpipe] identity seq==conc3: ${seq1 == par3}")
    spark.stop()
  }
}
