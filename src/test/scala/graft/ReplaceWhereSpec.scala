package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.sources.{Constraints, SnapshotLog}

/** Round 11: selective overwrite — `replaceWhere` commits Delta's
  * `INSERT … REPLACE WHERE p` as ONE atomic merge-on-read version
  * (tombstone the predicate's slice + append the batch), positions
  * instead of file rewrites. The spec proves the slice swap with every
  * pre-existing file byte-identical, the batch⊆predicate refusal, CDC
  * exactness (batch fold AND the changes stream), the degenerate
  * shapes (pure delete / plain append / no-op), the constraint gate,
  * the writer option, and the lineage refusals.
  */
class ReplaceWhereSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rw").toString + "/table"

  private def t(ps: (Int, String, String)*): DataFrame =
    ps.toSeq.toDF("k", "d", "v")

  private def rows(df: DataFrame): Set[(Int, String, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("replaceWhere swaps the slice atomically; pre-existing files byte-identical") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      t((1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d2", "e")))
    val before = fileState(new java.io.File(root))
    val v = SnapshotLog.replaceWhere(spark, root,
      t((10, "d1", "x"), (11, "d1", "y")), df => df("d") === "d1")
    assert(v == 2L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((10, "d1", "x"), (11, "d1", "y"), (3, "d2", "c"), (4, "d2", "e")))
    // positions, not rewrites: every pre-existing file untouched
    val after = fileState(new java.io.File(root))
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"replaceWhere rewrote $p")
    }
    // time travel: the replaced slice is still whole at version 1
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) ==
      Set((1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d2", "e")))
  }

  test("batch rows outside the predicate refuse; table unmoved") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, t((1, "d1", "a"), (3, "d2", "c")))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.replaceWhere(spark, root,
        t((10, "d1", "x"), (99, "d2", "oops")), df => df("d") === "d1")
    }
    assert(e.getMessage.contains("outside the predicate"))
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "d1", "a"), (3, "d2", "c")))
  }

  test("CDC fold: delete(old slice) + insert(batch), not an O(table) snapshot diff") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      t((1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")))
    SnapshotLog.replaceWhere(spark, root,
      t((10, "d1", "x")), df => df("d") === "d1")
    val chg = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
    val got = chg.collect()
      .map(r => (r.getString(chg.columns.indexOf("change_type")),
                 r.getInt(chg.columns.indexOf("k")))).toSet
    assert(got == Set(("delete", 1), ("delete", 2), ("insert", 10)),
      s"replace_where CDC drifted: $got")
    // the event fold reads touched positions + the new dir — the
    // O(table) fallback would full-outer join two whole snapshots
    val plan = chg.queryExecution.optimizedPlan.toString
    assert(!plan.contains("FullOuter"),
      s"expected the event-fold path, got the snapshot-diff fallback:\n$plan")
  }

  test("a NULL-predicate batch row counts as outside (three-valued logic hole)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, t((1, "d1", "a")))
    // d IS NULL → cond NULL → such a row would never be deleted by the
    // same predicate later; must refuse, not slip through NOT(NULL)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.replaceWhere(spark, root,
        Seq((10, Option.empty[String], "x")).toDF("k", "d", "v"),
        df => df("d") === "d1")
    }
    assert(e.getMessage.contains("outside the predicate"))
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
  }

  test("degenerate shapes: pure delete, plain append, no-op") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, t((1, "d1", "a"), (3, "d2", "c")))
    // empty batch + matches → pure DV delete
    SnapshotLog.replaceWhere(spark, root,
      t().limit(0), df => df("d") === "d2")
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "d1", "a")))
    // no matches + batch → a plain append commit (tail-shippable kind)
    SnapshotLog.replaceWhere(spark, root,
      t((5, "d9", "z")), df => df("d") === "d9")
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "d1", "a"), (5, "d9", "z")))
    // both empty → no-op at the current version
    val cur = SnapshotLog.versions(spark, root).last
    val v = SnapshotLog.replaceWhere(spark, root,
      t().limit(0), df => df("d") === "nope")
    assert(v == cur && SnapshotLog.versions(spark, root).last == cur)
  }

  test("the constraint gate covers replaceWhere: FAIL aborts, table unmoved") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, t((1, "d1", "a")))
    Constraints.add(spark, root, "k_pos", "k > 0")
    val e = intercept[Exception] {
      SnapshotLog.replaceWhere(spark, root,
        t((-7, "d1", "bad")), df => df("d") === "d1")
    }
    assert(e.getMessage.contains("k_pos"), s"not the constraint error: $e")
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "d1", "a")))
  }

  test("writer surface: mode=overwrite + option(replaceWhere)") {
    val root = freshRoot()
    t((1, "d1", "a"), (3, "d2", "c")).write.format("graft").save(root)
    t((10, "d1", "x")).write.format("graft").mode("overwrite")
      .option("replaceWhere", "d = 'd1'").save(root)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((10, "d1", "x"), (3, "d2", "c")))
    // and the batch⊆predicate contract holds through the writer too
    val e = intercept[Exception] {
      t((9, "d2", "n")).write.format("graft").mode("overwrite")
        .option("replaceWhere", "d = 'd1'").save(root)
    }
    assert(e.getMessage.contains("outside the predicate"))
  }

  test("the changes stream admits a replace_where commit: delete+insert ship") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft_rw_ck").toString
    val out = Files.createTempDirectory("graft_rw_out").toString
    SnapshotLog.commit(spark, root, t((1, "d1", "a"), (3, "d2", "c")))
    val q = spark.readStream.format("graft").option("changes", "true")
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      SnapshotLog.replaceWhere(spark, root,
        t((10, "d1", "x")), df => df("d") === "d1")
      q.processAllAvailable()
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType)))
      // the stream starts after the current snapshot — it ships the
      // replace_where commit's exact delete+insert pair (and nothing
      // for the untouched k=3)
      val got = spark.read.schema(sch).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSet
      assert(got == Set((1, "delete", 2L), (10, "insert", 2L)),
        s"changes stream drifted over replace_where: $got")
    } finally q.stop()
  }

  test("lineage refusals: scoped and MoR-keyed tables point to their verbs") {
    val scoped = freshRoot()
    SnapshotLog.upsertScoped(spark, scoped, t((1, "d1", "a")),
      keys = Seq("k"), partitionCol = "d")
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.replaceWhere(spark, scoped, t((2, "d1", "b")),
        df => df("d") === "d1")
    }
    assert(e1.getMessage.contains("upsertScoped"))
    val mor = freshRoot()
    SnapshotLog.upsertMor(spark, mor, t((1, "d1", "a")), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.replaceWhere(spark, mor, t((2, "d1", "b")),
        df => df("d") === "d1")
    }
    assert(e2.getMessage.contains("upsertMor"))
  }
}
