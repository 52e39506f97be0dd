package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.SnapshotLog

/** Measured fact for the round-8b FILE MANIFEST: on a long append chain,
  * compare planning-side file resolution from the sidecar
  * ([[SnapshotLog.filesFromSidecar]]) against the filesystem walk it
  * replaced — wall time (min of 5) at growing file counts, plus the
  * structural count of LIST calls each needs (walk = one per dir; at
  * 100 TB on an object store each LIST is a ~30 ms round-trip and dirs
  * number in the thousands — the manifest's one sidecar read replaces
  * ALL of them, so the local-disk timing below UNDERSTATES the win by
  * orders of magnitude). Run:
  * `sbt "runMain graft.tools.ManifestBench [commits] [filesPerCommit]"`.
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val commits = args.headOption.map(_.toInt).getOrElse(200)
    val perCommit = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val root = java.nio.file.Files.createTempDirectory("graft_manbench")
      .toString + "/t"

    (1 to commits).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        (1 to perCommit).map(j => (i * 1000 + j, s"r$i-$j")).toDF("k", "v")
          .repartition(perCommit))
    }
    val head = SnapshotLog.currentVersion(spark, root).get
    val dirs = SnapshotLog.dirsOf(spark, root, head)

    def time[A](reps: Int)(f: => A): (Double, A) = {
      var best = Double.MaxValue; var last: A = f
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); last = f
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
      }
      (best, last)
    }

    val (tSidecar, viaSidecar) = time(5) {
      SnapshotLog.filesFromSidecar(spark, root, head).get
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val (tWalk, viaWalk) = time(5) {
      dirs.flatMap { d =>
        val p = new org.apache.hadoop.fs.Path(rootPath, d)
        p.getFileSystem(conf).listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      }
    }
    require(viaSidecar.map(_.getPath.getName).sorted ==
            viaWalk.map(_.getPath.getName).sorted.toSeq,
      "sidecar and walk disagree on the file set")
    println(f"[manifest] dirs=${dirs.size}%d files=${viaWalk.size}%d | " +
      f"sidecar resolve ${tSidecar}%.1f ms (1 sidecar read, 0 LIST) | " +
      f"walk ${tWalk}%.1f ms (${dirs.size}%d LIST calls on local disk; " +
      "x ~30 ms each on an object store)")
    spark.stop()
  }
}
