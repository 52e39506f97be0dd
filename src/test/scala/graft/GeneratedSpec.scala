package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, upper}
import graft.sources.{Generated, SnapshotLog}

/** Generated columns (round 12 — Delta's GENERATED ALWAYS AS):
  * compute-if-absent, validate-if-present on every commit path through
  * the constraints chokepoint; UPDATE recomputes unassigned generated
  * columns; declaration-time checks (existing rows, self-reference,
  * chains, determinism, type) make the runtime gate total.
  */
class GeneratedSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_gen").toString + "/table"

  private def rows(df: DataFrame): Set[(Int, String, String)] =
    df.select("k", "v", "v_uc").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private def mkTable(): String = {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, "a", "A"), (2, "b", "B")).toDF("k", "v", "v_uc"),
      statsCols = Seq("k"))
    Generated.add(spark, root, "v_uc", "upper(v)")
    root
  }

  test("rename/drop refuse under declarations that bind the name (round 13)") {
    val root = mkTable()
    // the generated column itself, its source, and constraint sources
    // all refuse with the escape named — a rename underneath would
    // wedge every later gate on an unresolvable expression
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(spark, root, "v_uc", "upper_v")
    }
    assert(e1.getMessage.contains("GENERATED"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(spark, root, "v", "body")
    }
    assert(e2.getMessage.contains("generated column v_uc"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(spark, root, "v")
    }
    assert(e3.getMessage.contains("generated column v_uc"), e3.getMessage)
    graft.sources.Constraints.add(spark, root, "k_pos", "k > 0")
    val e4 = intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(spark, root, "k", "id")
    }
    assert(e4.getMessage.contains("constraint k_pos"), e4.getMessage)
    // dropping the declaration frees the name again
    graft.sources.Generated.drop(spark, root, "v_uc")
    SnapshotLog.renameColumn(spark, root, "v_uc", "upper_v")
    assert(SnapshotLog.read(spark, root).columns.toSeq ==
      Seq("k", "v", "upper_v"))
  }

  test("append without the column computes it; with a correct value passes") {
    val root = mkTable()
    // absent → computed (appendCommit is the plain streaming-shaped path)
    SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v"))
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a", "A"), (2, "b", "B"), (3, "c", "C")))
    // present and correct → passes untouched
    SnapshotLog.appendCommit(spark, root,
      Seq((4, "d", "D")).toDF("k", "v", "v_uc"))
    assert(rows(SnapshotLog.read(spark, root)).contains((4, "d", "D")))
  }

  test("a mismatching supplied value aborts the commit with the table unmoved") {
    val root = mkTable()
    val v0 = SnapshotLog.currentVersion(spark, root).get
    val e = intercept[Exception] {
      SnapshotLog.appendCommit(spark, root,
        Seq((9, "z", "WRONG")).toDF("k", "v", "v_uc"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("generated_v_uc")), msgs(e).toString)
    assert(SnapshotLog.currentVersion(spark, root).contains(v0),
      "a violating batch must not move the table")
    assert(!rows(SnapshotLog.read(spark, root)).exists(_._1 == 9))
  }

  test("keyed upsert computes the column for a batch that lacks it") {
    val root = mkTable()
    SnapshotLog.upsert(spark, root,
      Seq((1, "aa"), (5, "e")).toDF("k", "v"), Seq("k"))
    val got = rows(SnapshotLog.read(spark, root))
    assert(got.contains((1, "aa", "AA")) && got.contains((5, "e", "E")),
      got.toString)
  }

  test("updateWhere recomputes generated columns its SET does not assign") {
    val root = mkTable()
    SnapshotLog.updateWhere(spark, root,
      base => base("k") === 1, Map("v" -> lit("changed")))
    val got = rows(SnapshotLog.read(spark, root))
    assert(got.contains((1, "changed", "CHANGED")), got.toString)
    // an explicit SET of the generated column itself still validates:
    // a consistent pair passes…
    SnapshotLog.updateWhere(spark, root, base => base("k") === 2,
      Map("v" -> lit("x"), "v_uc" -> lit("X")))
    assert(rows(SnapshotLog.read(spark, root)).contains((2, "x", "X")))
    // …an inconsistent one aborts
    intercept[Exception] {
      SnapshotLog.updateWhere(spark, root, base => base("k") === 2,
        Map("v" -> lit("y"), "v_uc" -> lit("nope")))
    }
    assert(rows(SnapshotLog.read(spark, root)).contains((2, "x", "X")))
  }

  test("streaming-shaped commitBatch computes the column (exactly-once path)") {
    val root = mkTable()
    SnapshotLog.commitBatch(spark, root,
      Seq((7, "g")).toDF("k", "v"), keys = Seq("k"), batchId = 100L)
    assert(rows(SnapshotLog.read(spark, root)).contains((7, "g", "G")))
  }

  test("declaration-time refusals: existing rows, self-reference, chains, rand, type") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      Seq((1, "a", "MISMATCH"), (2, "b", "B")).toDF("k", "v", "v_uc"))
    // existing rows must already satisfy the expression
    val e1 = intercept[IllegalArgumentException] {
      Generated.add(spark, root, "v_uc", "upper(v)")
    }
    assert(e1.getMessage.contains("existing row"))
    // unknown column
    intercept[IllegalArgumentException] {
      Generated.add(spark, root, "nope", "upper(v)")
    }
    // self-reference
    val e2 = intercept[IllegalArgumentException] {
      Generated.add(spark, root, "v_uc", "upper(v_uc)")
    }
    assert(e2.getMessage.contains("self-reference"))
    // nondeterministic
    val e3 = intercept[IllegalArgumentException] {
      Generated.add(spark, root, "v_uc", "uuid()")
    }
    assert(e3.getMessage.contains("deterministic"))
    // type mismatch (string expression onto an int column)
    val e4 = intercept[IllegalArgumentException] {
      Generated.add(spark, root, "k", "concat(v, v)")
    }
    assert(e4.getMessage.contains("CAST") || e4.getMessage.contains("produces"))
    // fix the data, declare, then a CHAIN onto the generated column refuses
    SnapshotLog.updateWhere(spark, root, base => base("k") === 1,
      Map("v_uc" -> upper(col("v"))))
    Generated.add(spark, root, "v_uc", "upper(v)")
    val e5 = intercept[IllegalArgumentException] {
      Generated.add(spark, root, "v", "lower(v_uc)")
    }
    assert(e5.getMessage.contains("chains are not supported"), e5.getMessage)
  }

  test("drop_generated stops both computation and validation") {
    val root = mkTable()
    Generated.drop(spark, root, "v_uc")
    // absent column now fails alignment (no auto-compute) on upsert…
    intercept[Exception] {
      SnapshotLog.upsert(spark, root, Seq((8, "h")).toDF("k", "v"), Seq("k"))
    }
    // …and a mismatching value lands unchallenged
    SnapshotLog.appendCommit(spark, root,
      Seq((9, "z", "whatever")).toDF("k", "v", "v_uc"))
    assert(rows(SnapshotLog.read(spark, root)).contains((9, "z", "whatever")))
  }

  test("a MID-schema generated column computes into the table's column order") {
    val root = freshRoot()
    // generated column sits between two ordinary ones
    SnapshotLog.commit(spark, root,
      Seq((1, "A", "a"), (2, "B", "b")).toDF("k", "v_uc", "v"))
    Generated.add(spark, root, "v_uc", "upper(v)")
    // append-chain parity is ORDER-strict — the weave must put the
    // computed column back in the table's position
    SnapshotLog.appendCommit(spark, root, Seq((3, "c")).toDF("k", "v"))
    val got = SnapshotLog.read(spark, root)
      .select("k", "v", "v_uc").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a", "A"), (2, "b", "B"), (3, "c", "C")))
    // and replaceWhere tolerates the omitted generated column
    SnapshotLog.replaceWhere(spark, root,
      Seq((3, "cc")).toDF("k", "v"), base => base("k") === 3)
    assert(SnapshotLog.read(spark, root).filter("k = 3")
      .select("v_uc").collect().map(_.getString(0)).toSeq == Seq("CC"))
  }

  test("constraints may reference a computed generated column (weave order)") {
    val root = mkTable()
    graft.sources.Constraints.add(spark, root, "uc_nonempty",
      "length(v_uc) > 0")
    // the batch lacks v_uc: the weave computes it BEFORE the constraint
    // evaluates, so the gate sees the derived value
    SnapshotLog.appendCommit(spark, root, Seq((6, "f")).toDF("k", "v"))
    assert(rows(SnapshotLog.read(spark, root)).contains((6, "f", "F")))
  }
}
