// Operating-point sweep for multi-probe LSH top-pairs (round-6 VERDICT
// item 6): find (bits, tables, nprobe) that beats single-probe 4x8's
// recall on the adversarial near-uniform fixture at equal-or-lower
// candidate budget. Prints recall@10 vs q32 and candidate-pair counts.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{EmbedOps, LlmOps, Tables}

object LshProbeTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val corpus = Tables.embeddings(spark, dir)
      val brute = LlmOps.q32(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val baseCand = EmbedOps.lshCandidateCount(corpus, 4, 8, 0)
      println(s"== $dir  baseline 4x8x0: candidates=$baseCand")
      val base = EmbedOps.topCosinePairsLsh(corpus, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"   4x8x0 recall=${(base intersect brute).size}%d/10")
      for {
        (bits, tables, np) <- Seq((6, 5, 2), (6, 5, 3), (6, 4, 3), (7, 5, 3),
                                  (7, 6, 3), (7, 4, 3), (7, 6, 4), (7, 5, 4),
                                  (8, 6, 4), (8, 5, 4), (8, 6, 5), (7, 7, 4))
      } {
        val cand = EmbedOps.lshCandidateCount(corpus, bits, tables, np)
        val got = EmbedOps.topCosinePairsLshMultiProbe(corpus, 10, bits, tables, np)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (got intersect brute).size
        val ok = if (cand <= baseCand && recall >= 9) " <== MEETS" else ""
        println(f"   ${bits}%dx${tables}%dx$np%d recall=$recall%d/10 candidates=$cand%d (${100.0 * cand / baseCand}%.0f%% of base)$ok")
      }
    }
    // wall-clock at bench scale: the multi-probe default must not cost
    // more than the single-probe twin it replaces
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs (rows=$n)")
    }
    (1 to 2).foreach { rep =>
      time(s"sf0.1 single 4x8 rep$rep")(
        EmbedOps.topCosinePairsLsh(big, k = 10).count())
      time(s"sf0.1 multi 8x5x4 rep$rep")(
        EmbedOps.topCosinePairsLshMultiProbe(big, k = 10).count())
    }
    spark.stop()
  }
}
