package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** CDC streaming source (round 8): `.option("changes", "true")` ships
  * insert / delete change rows derived from the log's own artifacts —
  * appends, deletion vectors (old rows read back by position), and
  * merge-on-read updates (delete + insert pairs) — stamped with the
  * commit version, exactly-once across restart, refusing commits that
  * carry no row-level provenance.
  */
class CdcStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cdc").toString + "/t"

  private val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType)))

  test("changes stream: appends→insert, DV delete→old row, MoR update→pre/post-image pair") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdc_ck").toString
    val out = Files.createTempDirectory("graft_cdc_out").toString
    // a fault-tolerant sink so the restart leg recovers from the checkpoint
    def feed(): Seq[(Int, String, String, Long)] =
      spark.read.schema(cdcSchema).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def start() = spark.readStream.format("graft").option("changes", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()

    SnapshotLog.commit(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v")) // v1
    val q = start()
    try {
      q.processAllAvailable()
      assert(feed().isEmpty, "CDC starts at the head: no history ships")

      SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v")) // v2
      q.processAllAvailable()
      assert(feed().toSet == Set((3, "c", "insert", 2L)))

      // deletion vector: the DELETED row's payload ships as a delete
      SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k")) // v3
      q.processAllAvailable()
      assert(feed().toSet == Set(
        (3, "c", "insert", 2L), (1, "a", "delete", 3L)))

      // merge-on-read UPDATE: the CDF pre/post-image pair, one version
      SnapshotLog.updateWhere(spark, root,
        base => base("k") === 2, Map("v" -> lit("B"))) // v4
      q.processAllAvailable()
      assert(feed().toSet == Set(
        (3, "c", "insert", 2L), (1, "a", "delete", 3L),
        (2, "b", "update_preimage", 4L), (2, "B", "update_postimage", 4L)))
      assert(feed().size == 4, s"duplicate change rows: ${feed()}")
    } finally q.stop()

    // exactly-once across restart: a commit lands while the stream is
    // down; the restarted stream ships ONLY it — nothing re-delivered
    SnapshotLog.appendCommit(spark, root, Seq((9, "z")).toDF("k", "v")) // v5
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(feed().size == 5 && feed().toSet.contains((9, "z", "insert", 5L)))
    } finally q2.stop()
  }

  test("startingVersion replays the feed from history instead of future-only") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdc_ck_sv").toString
    val out = Files.createTempDirectory("graft_cdc_out_sv").toString
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))        // v1
    SnapshotLog.appendCommit(spark, root, Seq((2, "b")).toDF("k", "v"))  // v2
    SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v"))  // v3
    val q = spark.readStream.format("graft").option("changes", "true")
      .option("startingVersion", "2").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      val got = spark.read.schema(cdcSchema).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(2), r.getLong(3))).toSet
      // v2 and v3 replay as inserts; v1 (before the start) does not
      assert(got == Set((2, "insert", 2L), (3, "insert", 3L)), got.toString)
    } finally q.stop()
  }

  test("a rename landing AFTER stream start refuses loudly; post-start replay of a pre-start rename flows") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // mid-flight rename: the stream's pinned query-start schema cannot
    // decode change files spelled with the NEW logical names — silent
    // NULLs before round 11; a loud restart-contract refusal now
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdc_ck3").toString
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft").option("changes", "true").load(root)
      .writeStream.format("memory").queryName("cdc_rename_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      SnapshotLog.renameColumn(spark, root, "v", "w")              // v2: rename
      SnapshotLog.appendCommit(spark, root, Seq((2, "b")).toDF("k", "w")) // v3
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(messages(ex).exists(_.contains("restart")),
        s"expected the rename refusal, got: ${messages(ex)}")
    } finally q.stop()
    // a stream started AFTER the rename replays the historical rename
    // commit fine: its declared names ARE the post-rename names
    val ck2 = Files.createTempDirectory("graft_cdc_ck4").toString
    val q2 = spark.readStream.format("graft").option("changes", "true")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName("cdc_rename_replay")
      .option("checkpointLocation", ck2).start()
    try {
      q2.processAllAvailable()
      val got = spark.table("cdc_rename_replay")
        .select("k", "w", "_change_type", "_commit_version").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got == Set((2, "b", "insert", 3L)), got.toString)
    } finally q2.stop()
  }

  test("changes stream refuses a commit without row-level provenance") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_cdc_ck2").toString
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft").option("changes", "true").load(root)
      .writeStream.format("memory").queryName("cdc_guard_sink")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      SnapshotLog.commit(spark, root, Seq((7, "q")).toDF("k", "v")) // full rewrite
      val ex = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("replaced directories")),
        s"expected the provenance refusal, got: ${messages(ex)}")
    } finally q.stop()
  }
}
