package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.AnnIndex
import graft.sources.SnapshotLog

/** Measured facts for the PERSISTED ANN INDEX (round 13): what the
  * file-granular maintenance path buys over the full re-assignment it
  * replaced.
  *
  *   1. BUILD: the one full train+assign pass (the price paid once).
  *   2. INCREMENTAL refresh after a 1-file keyed delete — tombstone +
  *      re-assign of the changed files only — vs [[AnnIndex.compact]],
  *      the full re-assignment that used to be the ONLY non-append
  *      path. The gap is the design claim: O(changed files), not
  *      O(corpus), and it widens linearly with corpus size.
  *   3. QUERY: index knn (partition-pruned nprobe cells + tombstone
  *      anti-join) vs the brute-force scan, with recall@10 against the
  *      exact answer printed, not asserted away.
  *
  * Run: `sbt "runMain graft.tools.AnnBench [nDirs] [rowsPerDir] [dim]"`.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val nDirs = args.headOption.map(_.toInt).getOrElse(8)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val dim = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val root = java.nio.file.Files
      .createTempDirectory("graft_annbench").toString + "/emb"

    // deterministic spread-out vectors (no RNG: comparable across runs)
    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(sin(vec_id * 0.7 + d * 1.3) AS FLOAT))"))
      .coalesce(1)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    SnapshotLog.commit(spark, root, seed(0), statsCols = Seq("vec_id"))
    (1 until nDirs).foreach(d =>
      SnapshotLog.appendCommit(spark, root, seed(d), statsCols = Seq("vec_id")))
    val n = nDirs.toLong * rows

    val tBuild = time { AnnIndex.build(spark, root, k = 16, maxTrain = 4096) }

    // 1-file change: a pruned keyed delete rewrites one dir's file
    SnapshotLog.deleteByKey(spark, root,
      spark.range(100).toDF("vec_id"), Seq("vec_id"))
    val tInc = time { AnnIndex.refresh(spark, root) }
    // the full pass the incremental path replaced (also clears tombs)
    SnapshotLog.deleteByKey(spark, root,
      spark.range(rows.toLong, rows.toLong + 100).toDF("vec_id"), Seq("vec_id"))
    val tFull = time { AnnIndex.compact(spark, root) }

    // query: indexed vs brute force, recall@10 vs exact
    val q = (0 until dim).map(d => math.sin(d * 1.3).toFloat)
    def topIdx() = AnnIndex.knn(spark, root, q, k = 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    def topExact() = {
      val lit32 = typedLit(q.toArray).cast("array<float>")
      SnapshotLog.read(spark, root)
        .withColumn("score", call_function("vec_dot", col("embedding"), lit32))
        .orderBy(desc("score"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
    }
    val tIdx = (1 to 3).map(_ => time { topIdx() }).min
    val tBrute = (1 to 3).map(_ => time { topExact() }).min
    val recall = topIdx().toSet.intersect(topExact().toSet).size

    println(f"[annbench] corpus=$n rows dim=$dim dirs=$nDirs")
    println(f"[annbench] build (train+assign all): $tBuild%.2f s")
    println(f"[annbench] refresh after 1-file delete: incremental $tInc%.2f s vs full compact $tFull%.2f s (${tFull / tInc}%.1fx)")
    println(f"[annbench] knn: indexed $tIdx%.2f s vs brute-force $tBrute%.2f s, recall@10 = $recall/10 (nprobe 3/16)")
    spark.stop()
  }
}
