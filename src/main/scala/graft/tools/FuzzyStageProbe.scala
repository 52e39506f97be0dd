// One-off stage profiler for x66's pipeline at sf0.1: times each stage
// (tokens, freq, prefix pin, candidate join, distinct, verify) so the
// constant-factor work targets the ACTUAL bottleneck, not a guess.
// Run: sbt "runMain graft.tools.FuzzyStageProbe [dir]".
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object FuzzyStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val cap = 3; val q = 2
    val prefixLen = cap * q + 1
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fuzzystage] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val rows = graft.engine.Tables.part(spark, dir).select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("block"))
    val base = rows.select(col("id"), col("name"), col("block"),
      length(col("name")).as("len"))
    val toks = base.filter(col("len") >= q)
      .withColumn("grams", expr(
        s"transform(sequence(1, len - $q + 1), i -> substring(name, i, $q))"))
      .select(col("id"), col("block"), col("len"),
        explode(expr(
          "transform(grams, (g, i) -> " +
          "struct(g AS gram, size(filter(slice(grams, 1, i + 1), x -> x = g)) AS occ))"))
          .as("tok"))
      .select(col("id"), col("block"), col("len"),
        col("tok.gram").as("gram"), col("tok.occ").as("occ"))
    val nToks = time("tokens count")(toks.count())
    val freq = toks.groupBy("gram", "occ").agg(count(lit(1)).as("freq"))
    val nFreq = time("freq count")(freq.count())
    val prefix = toks.join(broadcast(freq), Seq("gram", "occ"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("freq"), col("gram"), col("occ"))))
      .filter(col("rank") <= prefixLen)
      .select("id", "block", "len", "gram", "occ")
      .localCheckpoint(eager = false)
    val nPrefix = time("prefix pin count")(prefix.count())
    val pa = prefix.select(col("block"), col("gram"), col("occ"),
      col("id").as("id_a"), col("len").as("len_a"))
    val pb = prefix.select(col("block").as("block_b"), col("gram").as("gram_b"),
      col("occ").as("occ_b"), col("id").as("id_b"), col("len").as("len_b"))
    val prefixCands = pa.join(pb,
        col("block") === col("block_b") && col("gram") === col("gram_b") &&
        col("occ") === col("occ_b") && col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= cap)
      .select("id_a", "id_b")
    val nCand = time("raw candidates count")(prefixCands.count())
    val dedup = prefixCands.distinct()
    val nDedup = time("distinct candidates")(dedup.count())
    val names = base.select(col("id"), col("name"))
    val verified = dedup
      .join(names.select(col("id").as("id_a"), col("name").as("name_a")), "id_a")
      .join(names.select(col("id").as("id_b"), col("name").as("name_b")), "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), cap))
      .filter(col("dist") >= 0)
    val nOut = time("verify + filter")(verified.count())
    println(s"[fuzzystage] toks=$nToks freq=$nFreq prefix=$nPrefix " +
      s"rawCand=$nCand dedup=$nDedup out=$nOut")
    spark.stop()
  }
}
