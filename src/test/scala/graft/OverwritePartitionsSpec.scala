package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sources.{Constraints, SnapshotLog}

/** Round 11: DYNAMIC PARTITION OVERWRITE — `overwritePartitions`
  * replaces every partition the batch touches wholesale (keyless),
  * carries untouched leafs byte-identical, and on an all-scoped
  * lineage reads ZERO pre-existing bytes. The spec proves the replace
  * semantics, the untouched-leaf byte identity, CDC delete+insert
  * recording, the exactly-once stamped variant, the writer surface,
  * the unscoped-parent migration, and the refusal edges.
  */
class OverwritePartitionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dpo").toString + "/table"

  private def t(ps: (Int, String, String)*): DataFrame =
    ps.toSeq.toDF("k", "p", "v")

  private def rows(df: DataFrame): Set[(Int, String, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("touched partitions replaced wholesale, untouched leafs byte-identical") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      t((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "c", "z1")),
      keys = Seq("k"), partitionCol = "p")
    val untouched = fileState(new java.io.File(root)).filter {
      case (q, _) => q.contains("__gp=b") || q.contains("__gp=c")
    }
    assert(untouched.nonEmpty)
    // keyless replace: k=1/k=2 do NOT merge — partition a becomes
    // exactly the batch's rows
    val v = SnapshotLog.overwritePartitions(spark, root,
      t((9, "a", "new")), partitionCol = "p")
    assert(v == 2L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((9, "a", "new"), (3, "b", "y1"), (4, "c", "z1")))
    val after = fileState(new java.io.File(root))
    untouched.foreach { case (q, st) =>
      assert(after.get(q).contains(st), s"overwrite touched untouched leaf $q")
    }
    // time travel: the replaced partition is whole at version 1
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) ==
      Set((1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1"), (4, "c", "z1")))
  }

  test("change feed records the replace as exact delete + insert rows") {
    val root = freshRoot()
    spark.conf.set("graft.changeFeed.enabled", "true")
    try {
      SnapshotLog.upsertScoped(spark, root,
        t((1, "a", "x1"), (3, "b", "y1")), Seq("k"), "p")
      SnapshotLog.overwritePartitions(spark, root, t((9, "a", "new")), "p")
      val chg = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      val got = chg.collect()
        .map(r => (r.getString(chg.columns.indexOf("change_type")),
                   r.getInt(chg.columns.indexOf("k")))).toSet
      assert(got == Set(("delete", 1), ("insert", 9)),
        s"partition-overwrite CDC drifted: $got")
    } finally spark.conf.unset("graft.changeFeed.enabled")
  }

  test("stamped variant is exactly-once; unscoped parent takes the migration") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root, t((1, "a", "x"), (3, "b", "y")),
      Seq("k"), "p")
    def run(): Option[Long] = SnapshotLog.overwritePartitionsBatch(
      spark, root, t((9, "a", "n")), "p", batchId = 1L)
    assert(run().contains(2L))
    assert(run().isEmpty, "replayed batch landed twice")
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((9, "a", "n"), (3, "b", "y")))
    // unscoped (flat) parent: untouched-partition rows migrate, touched
    // partition rows are replaced
    val flat = freshRoot()
    SnapshotLog.commit(spark, flat, t((1, "a", "x"), (3, "b", "y")))
    SnapshotLog.overwritePartitions(spark, flat, t((9, "a", "n")), "p")
    assert(rows(SnapshotLog.read(spark, flat)) ==
      Set((9, "a", "n"), (3, "b", "y")))
  }

  test("writer surface: mode=overwrite + partitionBy, no keys") {
    val root = freshRoot()
    t((1, "a", "x"), (3, "b", "y")).write.format("graft")
      .option("keys", "k").partitionBy("p").save(root)
    t((9, "a", "n")).write.format("graft").mode("overwrite")
      .partitionBy("p").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((9, "a", "n"), (3, "b", "y")))
    val e = intercept[IllegalArgumentException] {
      t((9, "a", "n")).write.format("graft").mode("overwrite")
        .option("keys", "k").partitionBy("p").save(root)
    }
    assert(e.getMessage.contains("wholesale"))
  }

  test("migration carries a NULL-partition parent row instead of dropping it") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, Some("a"), "x"), (7, Option.empty[String], "nullrow"))
        .toDF("k", "p", "v"))
    SnapshotLog.overwritePartitions(spark, root,
      Seq((9, Some("a"), "n")).toDF("k", "p", "v"), "p")
    val got = SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == Set((9, Some("a"), "n"), (7, None, "nullrow")),
      s"NULL-partition row dropped through three-valued logic: $got")
  }

  test("refusals: keys with replace, constraint gate, schema drift") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root, t((1, "a", "x")), Seq("k"), "p")
    Constraints.add(spark, root, "k_pos", "k > 0")
    val e1 = intercept[Exception] {
      SnapshotLog.overwritePartitions(spark, root, t((-2, "a", "bad")), "p")
    }
    assert(e1.getMessage.contains("k_pos"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a", "x")))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.overwritePartitions(spark, root,
        Seq((2L, "a", "w")).toDF("k", "p", "v"), "p")
    }
    assert(e2.getMessage.contains("schema"))
  }
}
