// Plan-inspection helper: sbt -batch "runMain graft.tools.ExplainDump q33_jaccard_pairs ..."
// Prints the formatted physical plan of each named declared query (or
// bench-only twin, round 17) at $SPARK_GRAFT_SF_DIR (default sf0.01).
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench-only twins Bench.scala times (same constructions)
    val twins: Map[String, (SparkSession, String) => DataFrame] = Map(
      "x66_fuzzy_prefix" -> ((s, dir) => graft.engine.Scalars.x66(s, dir)),
      "x41_near_dup_lsh" -> ((s, dir) =>
        graft.engine.EmbedOps.cosineNearDupPairs(
          graft.engine.Tables.embeddings(s, dir),
          threshold = 0.9, bits = 8, tables = 8)),
      "x32_top_pairs_lsh" -> ((s, dir) =>
        graft.engine.EmbedOps.topCosinePairsLshMultiProbe(
          graft.engine.Tables.embeddings(s, dir), k = 10)))
    val all = graft.SparkEntry.queries ++ twins
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      all(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
