package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sources.{Constraints, SnapshotLog}

/** Round 11: `upsertMor` — the merge-on-read keyed upsert every MoR
  * refusal message has pointed at since round 7, now implemented. The
  * spec proves O(batch) write cost (delta dir + untouched old files),
  * shadowing resolution at read, the key-unique/NULL-key/flat-lineage
  * refusals, DV composition, CDC via the keyed snapshot diff,
  * constraint gating, and compactChain as the materialization rung.
  */
class UpsertMorSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_mor").toString + "/table"

  private def t(ps: (Int, String)*): DataFrame = ps.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  private def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("O(batch) shadowing upsert: delta dir only, old files untouched, newest wins") {
    val root = freshRoot()
    assert(SnapshotLog.upsertMor(spark, root, t((1, "a"), (2, "b")),
      Seq("k")) == 1L)
    val before = fileState(new java.io.File(root))
    assert(SnapshotLog.upsertMor(spark, root, t((2, "B"), (3, "c")),
      Seq("k")) == 2L)
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a"), (2, "B"), (3, "c")))
    // the commit wrote ONLY the batch — version 2's dir has 2 rows and
    // version 1's files are byte-identical
    assert(spark.read.parquet(s"$root/data_v00000002").count() == 2,
      "upsertMor rewrote the snapshot instead of appending the batch")
    val after = fileState(new java.io.File(root))
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"upsertMor touched old file $p")
    }
    // time travel sees the pre-upsert resolution
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) ==
      Set((1, "a"), (2, "b")))
  }

  test("refusals: duplicate keys, NULL keys, flat lineage, drifted keys, plain append") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "a")), Seq("k"))
    val dup = intercept[IllegalArgumentException] {
      SnapshotLog.upsertMor(spark, root, t((2, "x"), (2, "y")), Seq("k"))
    }
    assert(dup.getMessage.contains("key-unique"))
    val nul = intercept[IllegalArgumentException] {
      SnapshotLog.upsertMor(spark, root,
        Seq((None: Option[Int], "n")).toDF("k", "v"), Seq("k"))
    }
    assert(nul.getMessage.contains("NULL key"))
    val drift = intercept[IllegalArgumentException] {
      SnapshotLog.upsertMor(spark, root, t((2, "b")), Seq("v"))
    }
    assert(drift.getMessage.contains("declared keys"))
    // the round-7 guard finally has a real target: plain appends refuse
    val app = intercept[IllegalArgumentException] {
      SnapshotLog.appendCommit(spark, root, t((9, "z")))
    }
    assert(app.getMessage.contains("upsertMor"))
    // and the inverse: a flat lineage refuses the MoR verb
    val flat = freshRoot()
    SnapshotLog.commit(spark, flat, t((1, "a"), (1, "dup")))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.upsertMor(spark, flat, t((2, "b")), Seq("k"))
    }
    assert(e.getMessage.contains("flat lineage"))
  }

  test("deletion vectors compose: a DV'd key stays dead until re-upserted") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "a"), (2, "b")), Seq("k"))
    SnapshotLog.tombstoneDeleteWhere(spark, root, df => df("k") === 1)
    assert(rows(SnapshotLog.read(spark, root)) == Set((2, "b")))
    SnapshotLog.upsertMor(spark, root, t((1, "A2")), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "A2"), (2, "b")))
  }

  test("predicate DELETE resolves against the VISIBLE table — no shadow resurrection") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "old"), (2, "b")), Seq("k"))
    SnapshotLog.upsertMor(spark, root, t((1, "new")), Seq("k"))
    // DELETE WHERE v='new' matches key 1's LATEST row only — the delete
    // must kill EVERY physical copy of key 1, or the DV anti-join
    // (applied before resolution) resurrects the shadowed (1,"old")
    SnapshotLog.tombstoneDeleteWhere(spark, root, df => df("v") === "new")
    assert(rows(SnapshotLog.read(spark, root)) == Set((2, "b")),
      "shadowed row resurrected by a latest-only deletion vector")
    // a predicate matching ONLY an invisible shadow deletes nothing
    SnapshotLog.upsertMor(spark, root, t((3, "s1")), Seq("k"))
    SnapshotLog.upsertMor(spark, root, t((3, "s2")), Seq("k"))
    SnapshotLog.tombstoneDeleteWhere(spark, root, df => df("v") === "s1")
    assert(rows(SnapshotLog.read(spark, root)) == Set((2, "b"), (3, "s2")),
      "a shadow-only predicate must not touch the visible table")
    // the OCC split (the SQL DELETE lowering) takes the same route
    SnapshotLog.tombstoneDeleteWhereOcc(spark, root, df => df("v") === "s2")
    assert(rows(SnapshotLog.read(spark, root)) == Set((2, "b")))
  }

  test("keyed DELETE by a NON-key column expands to whole mor keys") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((4, "x1"), (5, "keep")), Seq("k"))
    SnapshotLog.upsertMor(spark, root, t((4, "x2")), Seq("k"))
    // tombstone frame keyed by v: visible (4,"x2") matches → key 4 dies
    // entirely; the (4,"x1") shadow must not resurface
    SnapshotLog.tombstoneDeleteOcc(spark, root,
      Seq("x2").toDF("v"), Seq("v"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((5, "keep")),
      "non-key-column delete resurrected a shadow")
  }

  test("CDC: the keyed snapshot diff reports upserts as updates/inserts") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "a"), (2, "b")), Seq("k"))
    SnapshotLog.upsertMor(spark, root, t((2, "B"), (3, "c")), Seq("k"))
    val chg = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
    val got = chg.collect()
      .map(r => (r.getString(chg.columns.indexOf("change_type")),
                 r.getInt(chg.columns.indexOf("k")))).toSet
    assert(got == Set(("update", 2), ("insert", 3)),
      s"MoR CDC drifted: $got")
  }

  test("snapshot-rewrite keyed verbs refuse on MoR instead of silently converting") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "a")), Seq("k"))
    // upsert's classic fallback would resolve the shadow history, drop
    // the morKeys marker, and pay O(table) — refuse toward upsertMor
    val up = intercept[IllegalArgumentException] {
      SnapshotLog.upsert(spark, root, t((2, "b")), Seq("k"))
    }
    assert(up.getMessage.contains("upsertMor"))
    val cb = intercept[IllegalArgumentException] {
      SnapshotLog.commitBatch(spark, root, t((2, "b")), Seq("k"), 7L)
    }
    assert(cb.getMessage.contains("upsertMorBatch"))
    val dk = intercept[IllegalArgumentException] {
      SnapshotLog.deleteByKey(spark, root, Seq(1).toDF("k"), Seq("k"))
    }
    assert(dk.getMessage.contains("tombstoneDelete"))
    // the lineage is untouched and still MoR
    assert(SnapshotLog.versions(spark, root) == Seq(1L))
    SnapshotLog.upsertMor(spark, root, t((2, "b")), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a"), (2, "b")))
  }

  test("upsertMorBatch: exactly-once stamped replay gate") {
    val root = freshRoot()
    assert(SnapshotLog.upsertMorBatch(spark, root, t((1, "a")), Seq("k"),
      batchId = 0L).contains(1L))
    assert(SnapshotLog.upsertMorBatch(spark, root, t((1, "A")), Seq("k"),
      batchId = 1L).contains(2L))
    // a replay of batch 1 (crash before checkpoint commit) ships nothing
    assert(SnapshotLog.upsertMorBatch(spark, root, t((1, "DUP")), Seq("k"),
      batchId = 1L).isEmpty)
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "A")))
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
  }

  test("compactMor folds the chain but the lineage STAYS merge-on-read") {
    val root = freshRoot()
    SnapshotLog.upsertMorBatch(spark, root, t((1, "a"), (2, "b")), Seq("k"), 0L)
    SnapshotLog.upsertMorBatch(spark, root, t((2, "B2"), (3, "c")), Seq("k"), 1L)
    SnapshotLog.tombstoneDeleteWhere(spark, root, df => df("v") === "c")
    val v = SnapshotLog.compactMor(spark, root, nFiles = 1)
    assert(v == 4L)
    // one resolved dir: vectors folded, shadows gone, rows exact
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a"), (2, "B2")))
    assert(spark.read.parquet(s"$root/data_v00000004").count() == 2,
      "compactMor did not fold the chain into one resolved dir")
    // the streaming stamp carried: a replay of batch 1 still skips
    // (checked BEFORE any unstamped manual write — those wipe the
    // stamp by the documented single-stream contract)
    assert(SnapshotLog.upsertMorBatch(spark, root, t((1, "DUP")), Seq("k"),
      1L).isEmpty, "compactMor wiped the exactly-once replay gate")
    // the lineage is STILL merge-on-read: appends refuse, upserts shadow
    intercept[IllegalArgumentException] {
      SnapshotLog.appendCommit(spark, root, t((9, "z")))
    }
    SnapshotLog.upsertMor(spark, root, t((1, "A5")), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "A5"), (2, "B2")))
    // time travel sees the pre-compaction resolution
    assert(rows(SnapshotLog.readVersion(spark, root, 2L)) ==
      Set((1, "a"), (2, "B2"), (3, "c")))
    // flat lineages refuse the verb
    val flat = freshRoot()
    SnapshotLog.commit(spark, flat, t((1, "x")))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.compactMor(spark, flat)
    }
    assert(e.getMessage.contains("compactChain"))
  }

  test("graft.mor.autoCompactEvery: the sink self-maintains, replay gate intact") {
    val root = freshRoot()
    spark.conf.set("graft.mor.autoCompactEvery", "2")
    try {
      SnapshotLog.upsertMorBatch(spark, root, t((1, "a")), Seq("k"), 0L)
      // batch 1 commits v2, divisible by 2 → auto-compact commits v3
      SnapshotLog.upsertMorBatch(spark, root, t((1, "A2"), (2, "b")),
        Seq("k"), 1L)
      assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L, 3L),
        "auto-compact did not run after the 2nd committed version")
      assert(spark.read.parquet(s"$root/data_v00000003").count() == 2,
        "auto-compact did not fold the chain")
      assert(rows(SnapshotLog.read(spark, root)) == Set((1, "A2"), (2, "b")))
      // still MoR, replay still gated
      assert(SnapshotLog.upsertMorBatch(spark, root, t((9, "DUP")), Seq("k"),
        1L).isEmpty)
      SnapshotLog.upsertMorBatch(spark, root, t((2, "B4")), Seq("k"), 2L)
      assert(rows(SnapshotLog.read(spark, root)) == Set((1, "A2"), (2, "B4")))
    } finally spark.conf.unset("graft.mor.autoCompactEvery")
  }

  test("constraints gate MoR batches; compactChain materializes back to flat") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, t((1, "a")), Seq("k"))
    Constraints.add(spark, root, "k_pos", "k > 0")
    val e = intercept[Exception] {
      SnapshotLog.upsertMor(spark, root, t((-3, "bad")), Seq("k"))
    }
    assert(e.getMessage.contains("k_pos"))
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a")))
    SnapshotLog.upsertMor(spark, root, t((1, "a2"), (2, "b")), Seq("k"))
    // materialize: shadowing folds down, the lineage returns to flat
    SnapshotLog.compactChain(spark, root)
    assert(rows(SnapshotLog.read(spark, root)) == Set((1, "a2"), (2, "b")))
    // flat again: plain appends are legal once more
    SnapshotLog.appendCommit(spark, root, t((9, "z")))
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set((1, "a2"), (2, "b"), (9, "z")))
  }
}
