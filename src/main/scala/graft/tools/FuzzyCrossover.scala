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

    // LONG-STRING corpus (round 15 — the self-tuning dispatch's second
    // calibration point): ~48-char CLUSTERED syllable strings, 25
    // blocks, 12k rows. Grams cluster (16-syllable alphabet), so prefix
    // buckets stay big and brute is right — the model must not be
    // fooled by string length alone. Deterministic synthesis.
    import org.apache.spark.sql.functions.{col, expr}
    val syll = "ka,zo,mi,ru,ten,ba,li,xo,dra,ne,pu,vor,sha,gle,qu,fy"
    val longRows = spark.range(0, 12000).toDF("id")
      .withColumn("block", expr("CAST(id % 25 AS STRING)"))
      .withColumn("name", expr(
        s"array_join(transform(sequence(0, 23), i -> " +
        s"element_at(split('$syll', ','), " +
        s"1 + CAST((id * 2654435761 + i * 40503 + (id + i) * (id + i)) % 16 AS INT))), '')"))
      .select("id", "name", "block")
      .localCheckpoint(eager = true)
    def timeLong(label: String, bruteBelow: Long, plc: Double): Double = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val c = graft.engine.Scalars.fuzzyMatchPrefix(longRows,
          bruteBelow = bruteBelow, tokenCost = plc).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }.minBy(_._1)
      println(f"long-string 12k: $label%s = ${t._1}%.2fs / ${t._2} pairs")
      t._1
    }
    val lBrute = timeLong("brute(forced)", 32768, Double.MaxValue)
    val lDisp = timeLong("dispatched", 32768, 200.0)
    val lPrefix = timeLong("prefix(forced)", 0, 200.0)
    println(f"long-string verdict: dispatched ${lDisp}%.2fs vs brute " +
      f"${lBrute}%.2fs vs prefix ${lPrefix}%.2fs — dispatch " +
      (if (lDisp <= lBrute * 1.05) "OK (<= brute)" else "WRONG (> brute)"))

    // GRAM-DIVERSE corpus: 16k hash-like 48-char strings (hex of sha2),
    // 25 blocks — buckets collapse to near-singletons BUT brute's extra
    // pairs abandon the banded DP almost immediately (dissimilar
    // strings), so brute still wins at this block count (measured 0.95
    // vs 3.09 s — this corpus killed the first avgLen-weighted model);
    // the model flips to prefix only when block-pair mass is extreme
    // (few blocks) relative to the pipeline's token overhead
    val divRows = spark.range(0, 16000).toDF("id")
      .withColumn("block", expr("CAST(id % 25 AS STRING)"))
      .withColumn("name", expr(
        "substring(sha2(CAST(id AS STRING), 256), 1, 48)"))
      .select("id", "name", "block")
      .localCheckpoint(eager = true)
    def timeDiv(label: String, bruteBelow: Long, plc: Double): Double = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val c = graft.engine.Scalars.fuzzyMatchPrefix(divRows,
          bruteBelow = bruteBelow, tokenCost = plc).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }.minBy(_._1)
      println(f"gram-diverse 16k: $label%s = ${t._1}%.2fs / ${t._2} pairs")
      t._1
    }
    val dBrute = timeDiv("brute(forced)", 32768, Double.MaxValue)
    val dDisp = timeDiv("dispatched", 32768, 200.0)
    println(f"gram-diverse verdict: dispatched ${dDisp}%.2fs vs brute " +
      f"${dBrute}%.2fs — dispatch " +
      (if (dDisp <= dBrute * 1.05) "OK (<= brute)" else "WRONG (> brute)"))
    spark.stop()
  }
}
