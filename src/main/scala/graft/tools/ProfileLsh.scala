// Scratch profiler for the LSH near-dup pipeline stages (bench tuning).
// Also runs the scale-crossover experiment: brute-force O(n²) vs LSH on a
// synthetic n×-replicated corpus (written under /tmp, never to testdata).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{EmbedOps, Tables}

object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.functions.VectorFunctions.register(spark)
    val corpus = Tables.embeddings(spark, dir)
    println(s"corpus rows = ${corpus.count()}, dim = ${corpus.select(size(col("embedding"))).head.getInt(0)}")
    corpus.count() // warm
    time("lsh sf0.1 (cold)") {
      EmbedOps.cosineNearDupPairs(corpus, 0.9, bits = 8, tables = 8).count()
    }
    time("lsh sf0.1 (warm)") {
      EmbedOps.cosineNearDupPairs(corpus, 0.9, bits = 8, tables = 8).count()
    }
    time("q41 brute force sf0.1") {
      graft.engine.Training.q41(spark, dir).count()
    }
    // ---- scale crossover: 10× corpus (20k vectors). Perturbed replicas
    // (deterministic per-copy offset on one component) so near-dup structure
    // stays realistic rather than exploding with exact duplicates.
    val big = (0 until 10).map { copy =>
      corpus.select(
        (col("vec_id") + lit(copy * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === lit(copy % 64), x + lit(copy.toFloat * 0.01f))
            .otherwise(x)).cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _)
    val bigPath = "/tmp/lsh_scale_corpus"
    big.write.mode("overwrite").parquet(bigPath)
    val bigCorpus = spark.read.parquet(bigPath)
    println(s"big corpus rows = ${bigCorpus.count()}")
    val nLsh = time("lsh 10x corpus") {
      EmbedOps.cosineNearDupPairs(bigCorpus, 0.9, bits = 8, tables = 8,
        idCol = "vec_id").count()
    }
    println(s"  lsh pairs = $nLsh")
    // brute force on 20k rows = 200M pairs: same shape as q41
    val a = bigCorpus.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = bigCorpus.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    val nBrute = time("brute force 10x corpus") {
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(expr("vec_dot(vec_a, vec_b)") >= 0.9).count()
    }
    println(s"  brute pairs = $nBrute")
    spark.stop()
  }
}
