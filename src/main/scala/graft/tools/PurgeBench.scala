package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Measured fact for the TARGETED deletion-vector purge (round 12):
  * grow two identical flat chains (one file per dir, spans + blooms),
  * tombstone-delete a handful of keys that all land in ONE file, then
  * clear the vectors — once with `purgeDeletedRows` (rewrites exactly
  * the one DV'd file, carries the rest by reference) and once with
  * `compactChain` (the only pre-round-12 escape: materialize the whole
  * table). The compact cost grows with the TABLE; the purge cost
  * tracks the VECTOR-REFERENCED FILES — at 100 TB the difference
  * between erasing one region's rows costing ~one file and costing
  * the lake.
  * Run: `sbt "runMain graft.tools.PurgeBench [nDirs] [rowsPerDir]"`.
  */
object PurgeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDirs = args.headOption.map(_.toInt).getOrElse(16)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(1000000)
    val base = java.nio.file.Files.createTempDirectory("graft_purgebench").toString

    def seed(d: Int) = spark.range(d.toLong * rows, (d + 1L) * rows)
      .toDF("k").withColumn("v", md5(col("k").cast("string")))
      .coalesce(1)

    def build(label: String): String = {
      val root = s"$base/$label"
      (0 until nDirs).foreach(d =>
        SnapshotLog.appendCommit(spark, root, seed(d),
          statsCols = Seq("k"), bloomCols = Seq("k")))
      // 5 deleted keys, all inside dir 3's span — ONE DV'd file
      SnapshotLog.tombstoneDelete(spark, root,
        (0 until 5).map(i => Tuple1(3L * rows + 11 + i)).toDF("k"), Seq("k"))
      root
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rootP = build("purge")
    val rootC = build("compact")
    val tPurge = time { SnapshotLog.purgeDeletedRows(spark, rootP) }
    val tCompact = time { SnapshotLog.compactChain(spark, rootC) }
    val nP = SnapshotLog.read(spark, rootP).count()
    val nC = SnapshotLog.read(spark, rootC).count()
    require(nP == nC && nP == nDirs.toLong * rows - 5,
      s"row drift: purge=$nP compact=$nC")
    println(f"[purgebench] dirs=$nDirs rowsPerDir=$rows (${nDirs.toLong * rows} rows)")
    println(f"[purgebench] purgeDeletedRows (1 DV'd file rewritten): $tPurge%.2f s")
    println(f"[purgebench] compactChain (whole table rewritten):     $tCompact%.2f s")
    println(f"[purgebench] speedup ${tCompact / tPurge}%.1fx — compact grows with the table, purge with the referenced files")
    spark.stop()
  }
}
