// Shared fixture for the 10⁶-file metadata benches (PlanningBench reads,
// MaintenanceBench writes): a real snapshot-log table whose parquet stats
// checkpoint lists N fictitious files — 1 listing + 4 span + 4 null-count
// rows per file, the real writer's multi-skip-column shape — so metadata
// verbs pay their true O(files) costs while synthesis stays O(checkpoint
// rows). Fake files are never READ (metadata only).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

object PlanFixture {
  /** Build the table and return its root. `n` fake files land in the
    * HEAD version's checkpoint dir as extra part files (the stack
    * unions them with the real rows).
    */
  def build(spark: SparkSession, n: Int): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_planbench")
      .toString + "/t"
    SnapshotLog.appendCommit(spark, root,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1),
      statsCols = Seq("k"))
    // a rename pins the schema in the manifest, so planning NEVER
    // opens a file footer — fake file paths are safe to plan over
    SnapshotLog.renameColumn(spark, root, "v", "w")
    val head = SnapshotLog.currentVersion(spark, root).get
    val dirBase = f"data_v${1L}%08d"
    val fake = spark.range(1, n + 1L)
      .select(concat(lit(dirBase + "/part-fake-"), col("id"),
        lit(".parquet")).as("k0"), col("id"))
    // FOUR stats columns per file (the realistic shape — a table
    // tracks several skip columns): probes on `k` alone must leave
    // the other columns' rows on disk (the predicate-column filter)
    val statCols = Seq("k", "c2", "c3", "c4")
    val fakeRows = fake.select(col("k0").as("k"), lit("").as("c"),
        lit("f").as("t"), lit("1048576").as("a"), lit("0").as("b"))
      .unionAll(statCols.map(sc =>
        fake.select(col("k0").as("k"), lit(sc).as("c"),
          lit("n").as("t"),
          (col("id") * 1000L).cast("string").as("a"),
          (col("id") * 1000L + 999L).cast("string").as("b")))
        .reduce(_ unionAll _))
      .unionAll(statCols.map(sc =>
        fake.select(col("k0").as("k"), lit(sc).as("c"),
          lit("z").as("t"), lit("0").as("a"), lit("1000").as("b")))
        .reduce(_ unionAll _))
    val pqDir = SnapshotLog.statsPqPath(root, head)
    // mirror the real writer's (t, c) clustering (round 14): the
    // planning scans' pushed filters then skip whole row groups
    fakeRows.repartition(16).sortWithinPartitions("t", "c")
      .write.mode("append").parquet(pqDir.toString)
    root
  }

  def usedHeapMb(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
    (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
  }
}
