package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AnnIndex
import graft.sources.SnapshotLog

/** Measured facts for BATCH kNN (round 16 — verdict r15 #1/#7): the
  * operator's reason to exist is "one pass over the probed-cell union
  * instead of Q job round-trips", and until this round that claim had
  * no recorded number; the r15 routing loop also betrayed its own
  * ceiling (boxed full centroid sort per query). Three measurements:
  *
  *   1. BATCH vs PER-QUERY, ivf kind: `knnAll` over Q queries vs a
  *      loop of Q per-query [[AnnIndex.knn]] calls on the same corpus
  *      (the per-query loop runs a SAMPLE and extrapolates linearly —
  *      each call is an independent job round-trip, so linear is the
  *      generous-to-per-query model; both numbers printed).
  *   2. The same for the ivfpq kind (new in r16 — chunked ADC).
  *   3. ROUTING microbench at the conf ceiling: Q=65536 queries
  *      routed against nlist=4096 × dim=64 synthetic centroids —
  *      the primitive-array partial selection ([[AnnIndex.topCells]])
  *      vs the r15 boxed `zip/map/sum` full sort it replaced.
  *
  * Run: `sbt "runMain graft.tools.AnnBatchBench [corpusRows] [dim] [Q]"`.
  */
object AnnBatchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val rows = args.headOption.map(_.toInt).getOrElse(40000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val q = args.drop(2).headOption.map(_.toInt).getOrElse(1000)
    val root = java.nio.file.Files
      .createTempDirectory("graft_annbatch").toString + "/emb"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // the tie-dense sin manifold the recall benches use
    val corpus = spark.range(0, rows.toLong).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(vec_id * 0.7 + d * 1.3) AS FLOAT))"))
      .repartition(8)
    SnapshotLog.commit(spark, root, corpus, statsCols = Seq("vec_id"))
    AnnIndex.build(spark, root, k = 64, maxTrain = 8192)
    AnnIndex.buildPq(spark, root, "ivfpq", kCells = 64, m = 8, kPq = 256,
      maxTrain = 8192)

    val queries = spark.range(0, q.toLong).toDF("qid")
      .withColumn("qvec", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(qid * 1.9 + d * 1.3) AS FLOAT))"))
    val qLocal = queries.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1)))
    val sample = math.min(q, 100)

    println(s"[annbatch] corpus=$rows dim=$dim Q=$q nlist=64 nprobe=3 k=10")
    for (kind <- Seq("ivf", "ivfpq")) {
      // warm both paths once (session/codegen init must not bias run 1)
      AnnIndex.knnAll(spark, root, queries.limit(2), 10, kind).count()
      AnnIndex.knn(spark, root, qLocal.head._2, 10, kind).count()
      val tBatch = time { AnnIndex.knnAll(spark, root, queries, 10, kind)
        .count() }
      val tSample = time { qLocal.take(sample).foreach { case (_, v) =>
        AnnIndex.knn(spark, root, v, 10, kind).count() } }
      val tLoop = tSample / sample * q
      println(f"[annbatch] $kind%-6s batch knnAll($q): $tBatch%.2f s; " +
        f"per-query loop: $tSample%.2f s for $sample → " +
        f"~${tLoop}%.1f s for $q (${tLoop / tBatch}%.1fx)")
    }

    // routing microbench at the conf ceiling — no index needed, just
    // the centroid math: new partial selection vs the r15 boxed sort
    val nlist = 4096
    val cents = Array.tabulate(nlist)(c =>
      Array.tabulate(dim)(d => math.sin(c * 0.37 + d * 1.3)))
    val qs = Array.tabulate(65536)(i =>
      Array.tabulate(dim)(d => math.sin(i * 1.9 + d * 1.3)))
    val tNew = time { qs.foreach(AnnIndex.topCells(cents, _, 3)) }
    // the replaced r15 shape, on 1/16 of the batch, extrapolated
    val oldSample = qs.take(4096)
    val tOldSample = time { oldSample.foreach { qd =>
      cents.indices
        .sortBy(c => -cents(c).zip(qd).map(p => p._1 * p._2).sum)
        .take(3) } }
    println(f"[annbatch] routing Q=65536 nlist=$nlist dim=$dim: " +
      f"primitive partial-select $tNew%.1f s; r15 boxed full sort " +
      f"${tOldSample}%.1f s for 4096 → ~${tOldSample * 16}%.0f s for 65536")
    spark.stop()
  }
}
