package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** Row tracking phase 1 (round 12 — Delta row tracking / Iceberg row
  * lineage): metadata-derived stable `_row_id` (per-file base + row
  * index, zero bytes per row on the append path). Under test: identity
  * stability across appends and DV deletes; fresh ids for new rows;
  * loud refusal when a rewrite broke coverage + enable-as-repair;
  * scoped lineages; MoR refusal.
  */
class RowTrackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rt").toString + "/table"

  /** k → _row_id over the current snapshot. */
  private def idMap(root: String): Map[Int, Long] =
    SnapshotLog.readWithRowIds(spark, root)
      .select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("ids are unique, stable across appends, and fresh rows extend them") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v").repartition(3),
      statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val m1 = idMap(root)
    assert(m1.size == 10 && m1.values.toSet.size == 10, m1.toString)
    SnapshotLog.appendCommit(spark, root,
      (11 to 15).map(i => (i, s"v$i")).toDF("k", "v"))
    val m2 = idMap(root)
    assert(m2.size == 15 && m2.values.toSet.size == 15)
    // old rows keep their identities bit-for-bit
    m1.foreach { case (k, id) => assert(m2(k) == id, s"id moved for k=$k") }
    // new rows got ids past the old high-water mark
    val newIds = (11 to 15).map(m2)
    assert(newIds.forall(_ >= m1.values.max + 1))
    // enable is idempotent on a fully covered table (no new version)
    val head = SnapshotLog.currentVersion(spark, root).get
    assert(SnapshotLog.enableRowTracking(spark, root) == head)
  }

  test("deletion vectors remove identities without touching survivors") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v"), statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val before = idMap(root)
    SnapshotLog.tombstoneDelete(spark, root, Seq(3, 7).toDF("k"), Seq("k"))
    val after = idMap(root)
    assert(after.size == 8 && !after.contains(3) && !after.contains(7))
    after.foreach { case (k, id) => assert(before(k) == id) }
  }

  test("compaction preserves identities bit-for-bit (materialized column)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v").repartition(4),
      statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(4)).toDF("k"), Seq("k"))
    val before = idMap(root)
    // bin-pack rewrite: the packed file must carry the old ids forward
    // (and fold the vector without resurrecting k=4)
    SnapshotLog.compactSmallFiles(spark, root, 1L << 30)
    val after = idMap(root)
    assert(after == before, s"compaction moved identities: $before -> $after")
    // the materialized column is invisible to plain reads
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(SnapshotLog.readPruned(spark, root).columns.toSeq == Seq("k", "v"))
  }

  test("purge preserves survivor identities; keyed upsert keeps matched ids") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 20).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(2, $"k"),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(5)).toDF("k"), Seq("k"))
    val before = idMap(root)
    SnapshotLog.purgeDeletedRows(spark, root)
    assert(idMap(root) == before, "purge moved survivor identities")
    // pruned keyed MERGE: updated row keeps its id, carried rows keep
    // theirs, the inserted row gets a fresh one
    SnapshotLog.upsert(spark, root,
      Seq((3, "V3"), (100, "new")).toDF("k", "v"), Seq("k"))
    val after = idMap(root)
    assert(after(3) == before(3), "update re-identified the row")
    before.filterNot(_._1 == 5).foreach { case (k, id) =>
      assert(after(k) == id, s"carried row k=$k re-identified") }
    assert(after.contains(100) &&
      !before.values.toSet.contains(after(100)))
    // and the updated value actually landed
    assert(SnapshotLog.read(spark, root).filter("k = 3")
      .select("v").head.getString(0) == "V3")
  }

  test("updateWhere keeps the rewritten rows' identities") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v"), statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val before = idMap(root)
    SnapshotLog.updateWhere(spark, root,
      base => base("k") % 2 === 0, Map("v" -> lit("even")))
    val after = idMap(root)
    assert(after == before, s"updateWhere moved identities: $before -> $after")
    assert(SnapshotLog.read(spark, root).filter("v = 'even'").count() == 5)
    // a second update on already-rewritten rows (materialized-id files)
    // still preserves
    SnapshotLog.updateWhere(spark, root,
      base => base("k") === 2, Map("v" -> lit("twice")))
    assert(idMap(root) == before)
  }

  test("compactChain preserves identities; time travel reads old ids") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 12).map(i => (i, s"v$i")).toDF("k", "v").repartition(3),
      statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(6)).toDF("k"), Seq("k"))
    val before = idMap(root)
    val vPre = SnapshotLog.currentVersion(spark, root).get
    SnapshotLog.compactChain(spark, root, nFiles = 2)
    assert(idMap(root) == before,
      "full materializing compaction moved identities")
    // plain reads stay rid-free after the materialized rewrite
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v"))
    // versioned identity read still works on the pre-compaction version
    val old = SnapshotLog.readWithRowIds(spark, root, Some(vPre))
      .select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(old == before)
  }

  test("scoped upsert preserves ids: untouched leafs, touched-leaf carried AND updated rows") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "x1"), (2, "b", "x2"), (4, "b", "x4"))
        .toDF("k", "p", "v"),
      keys = Seq("k"), partitionCol = "p", statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val m1 = idMap(root)
    // touch only leaf b: update k=2, insert k=3 — k=4 rides the leaf
    // rewrite as a carried row
    SnapshotLog.upsertScoped(spark, root,
      Seq((2, "b", "X2"), (3, "b", "x3")).toDF("k", "p", "v"),
      Seq("k"), "p")
    val m2 = idMap(root)
    assert(m2(1) == m1(1), "untouched leaf's identity moved")
    assert(m2(2) == m1(2), "updated row re-identified")
    assert(m2(4) == m1(4), "carried row in the touched leaf re-identified")
    assert(m2.contains(3) && m2.values.toSet.size == 4)
    assert(SnapshotLog.read(spark, root).filter("k = 2")
      .select("v").head.getString(0) == "X2")
    // the OCC scoped stage preserves too
    SnapshotLog.upsertScopedOcc(spark, root,
      Seq((4, "b", "X4")).toDF("k", "p", "v"), Seq("k"), "p")
    val m3 = idMap(root)
    assert(m3(4) == m1(4) && m3(2) == m1(2) && m3(3) == m2(3), m3.toString)
  }

  test("the streaming tail passes an enable commit as a metadata-only no-op") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, Seq((1, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("rt_tail_sink").start()
    try {
      q.processAllAvailable()
      // mid-flight enable: identical dirs and vectors, zero row changes
      SnapshotLog.enableRowTracking(spark, root)
      SnapshotLog.appendCommit(spark, root, Seq((2, "b")).toDF("k", "v"))
      q.processAllAvailable()
      assert(spark.table("rt_tail_sink").count() == 2,
        "tail must continue through the enable commit")
    } finally q.stop()
  }

  test("changesByRowId: keyless exact CDC — inserts, deletes, updates by identity") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 6).map(i => (i, s"v$i")).toDF("k", "v"), statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val v0 = SnapshotLog.currentVersion(spark, root).get
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(2)).toDF("k"), Seq("k"))
    SnapshotLog.updateWhere(spark, root,
      base => base("k") === 3, Map("v" -> lit("V3")))
    SnapshotLog.appendCommit(spark, root, Seq((7, "v7")).toDF("k", "v"))
    val feed = SnapshotLog.changesByRowId(spark, root, v0,
      SnapshotLog.currentVersion(spark, root).get)
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set(
      (2, "v2", "delete"),
      (3, "v3", "update_preimage"), (3, "V3", "update_postimage"),
      (7, "v7", "insert")), feed.toString)
    // pure-append range short-circuits to delta-dirs-as-inserts
    val vMid = SnapshotLog.currentVersion(spark, root).get
    SnapshotLog.appendCommit(spark, root, Seq((8, "v8")).toDF("k", "v"))
    val appendFeed = SnapshotLog.changesByRowId(spark, root, vMid,
      SnapshotLog.currentVersion(spark, root).get)
      .select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(appendFeed == Set((8, "insert")), appendFeed.toString)
  }

  test("metaRowCount answers from row-id assignments with no stats columns") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 7).map(i => (i, s"v$i")).toDF("k", "v")) // NO statsCols
    assert(SnapshotLog.metaRowCount(spark, root).isEmpty,
      "untracked + unstatted: only a scan knows the count")
    SnapshotLog.enableRowTracking(spark, root)
    assert(SnapshotLog.metaRowCount(spark, root).contains(7L))
    SnapshotLog.appendCommit(spark, root, Seq((8, "v8")).toDF("k", "v"))
    assert(SnapshotLog.metaRowCount(spark, root).contains(8L))
    // a deletion vector makes the metadata answer unsound — bail
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(1)).toDF("k"), Seq("k"))
    assert(SnapshotLog.metaRowCount(spark, root).isEmpty)
    // purging the vector restores the metadata answer
    SnapshotLog.purgeDeletedRows(spark, root)
    assert(SnapshotLog.metaRowCount(spark, root).contains(7L))
  }

  test("merge-on-read lineages track rows: shadow commits inherit identities (round 13)") {
    val root = freshRoot()
    SnapshotLog.createMorTable(spark, root,
      Seq((1, "a")).toDF("k", "v").schema, Seq("k"))
    SnapshotLog.upsertMor(spark, root,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k"),
      statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val v1 = SnapshotLog.currentVersion(spark, root).get
    val m1 = idMap(root)
    assert(m1.size == 3 && m1.values.toSet.size == 3)
    def files(): Map[String, Long] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
        .filter(_.getPath.contains("/data_v"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    // shadow upsert: updated key INHERITS its identity, insert is fresh,
    // and every pre-existing data file stays byte-untouched (the MoR
    // O(batch) dividend survives tracking)
    SnapshotLog.upsertMor(spark, root,
      Seq((2, "B"), (4, "d")).toDF("k", "v"), Seq("k"))
    val v2 = SnapshotLog.currentVersion(spark, root).get
    assert(files().filterKeys(before.contains).toMap == before,
      "a tracked MoR upsert touched pre-existing files")
    val m2 = idMap(root)
    assert(m2.size == 4)
    Seq(1, 2, 3).foreach(k => assert(m2(k) == m1(k),
      s"MoR upsert moved id for k=$k: ${m1(k)} -> ${m2(k)}"))
    assert(m2(4) > m1.values.max, "MoR insert must take a fresh id")
    // keyless exact CDC works across the shadow commit
    val chg = SnapshotLog.changesByRowId(spark, root, v1, v2)
      .select("k", "v", "_row_id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(chg == Set(
      (2, "b", m1(2), "update_preimage"),
      (2, "B", m1(2), "update_postimage"),
      (4, "d", m2(4), "insert")), chg.toString)
    // vector delete: survivors stable, feed reports the delete
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(3)).toDF("k"), Seq("k"))
    val v3 = SnapshotLog.currentVersion(spark, root).get
    val m3 = idMap(root)
    assert(m3.size == 3 && !m3.contains(3))
    m3.foreach { case (k, id) => assert(m2(k) == id) }
    val chg23 = SnapshotLog.changesByRowId(spark, root, v2, v3)
      .select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(chg23 == Set((3, "delete")), chg23.toString)
    // compactMor folds the chain: identities intact, lineage stays MoR,
    // and the reorganization is CDC-silent
    SnapshotLog.compactMor(spark, root)
    val v4 = SnapshotLog.currentVersion(spark, root).get
    assert(SnapshotLog.morKeysOf(spark, root, v4) == Seq("k"))
    assert(idMap(root) == m3, "compactMor moved identities")
    assert(SnapshotLog.changesByRowId(spark, root, v3, v4).isEmpty,
      "compactMor must produce an empty identity feed")
    // ...and keeps composing: another tracked shadow commit
    SnapshotLog.upsertMor(spark, root, Seq((1, "A")).toDF("k", "v"), Seq("k"))
    val m5 = idMap(root)
    assert(m5(1) == m3(1) && m5(2) == m3(2) && m5(4) == m3(4))
    // compactChain materializes to FLAT with identities carried
    SnapshotLog.compactChain(spark, root)
    val v6 = SnapshotLog.currentVersion(spark, root).get
    assert(SnapshotLog.morKeysOf(spark, root, v6).isEmpty)
    assert(idMap(root) == m5, "compactChain dropped MoR identities")
  }

  test("changesByRowId is file-granular: a 1-file upsert diffs 2 files, not the table (round 13)") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      (11 to 20).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    SnapshotLog.appendCommit(spark, root,
      (21 to 30).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    SnapshotLog.enableRowTracking(spark, root)
    val v1 = SnapshotLog.currentVersion(spark, root).get
    val before = idMap(root)
    // keyed upsert whose span matches exactly one of the three files
    SnapshotLog.upsert(spark, root, Seq((15, "V15")).toDF("k", "v"),
      Seq("k"), statsCols = Seq("k"))
    val v2 = SnapshotLog.currentVersion(spark, root).get
    // the scale assertion: the diff's read set is predecessor + rewrite
    val (oldP, newP) = SnapshotLog.changedFileSlices(spark, root, v1, v2)
    assert(oldP.size == 1 && newP.size == 1,
      s"expected a 2-file diff, got old=$oldP new=$newP")
    val chg = SnapshotLog.changesByRowId(spark, root, v1, v2)
      .select("k", "v", "_row_id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(chg == Set(
      (15, "v15", before(15), "update_preimage"),
      (15, "V15", before(15), "update_postimage")), chg.toString)
    // DV delete: only the vector-referenced file enters the diff
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(25)).toDF("k"), Seq("k"))
    val v3 = SnapshotLog.currentVersion(spark, root).get
    val (o2, n2) = SnapshotLog.changedFileSlices(spark, root, v2, v3)
    assert(o2.size == 1 && n2.size == 1, s"old=$o2 new=$n2")
    val chg2 = SnapshotLog.changesByRowId(spark, root, v2, v3)
      .select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(chg2 == Set((25, "delete")), chg2.toString)
    // net cross-range feed composes both
    val chg13 = SnapshotLog.changesByRowId(spark, root, v1, v3)
      .select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(chg13 == Set((15, "update_preimage"), (15, "update_postimage"),
      (25, "delete")), chg13.toString)
    // a pure reorganization is CDC-silent: compaction rewrites files
    // and folds the vector, but identities + bytes are unchanged
    SnapshotLog.compactSmallFiles(spark, root, 1L << 30)
    val v4 = SnapshotLog.currentVersion(spark, root).get
    assert(v4 > v3 && SnapshotLog.changesByRowId(spark, root, v3, v4).isEmpty,
      "compaction must produce an empty identity feed")
  }

  test("classic (unstatted) upsert + deleteByKey fallbacks keep ids by key (round 13)") {
    val root = freshRoot()
    // NO statsCols and no usable skipping sidecar → the pruned path is
    // ineligible and the keyed full-rewrite fallback runs — before the
    // round-13 fix it silently re-based every carried row
    SnapshotLog.commit(spark, root,
      (1 to 6).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.enableRowTracking(spark, root)
    val m1 = idMap(root)
    SnapshotLog.upsert(spark, root,
      Seq((2, "V2"), (7, "v7")).toDF("k", "v"), Seq("k"))
    val m2 = idMap(root)
    assert(m2.size == 7)
    // carried AND updated rows keep their identities through the key
    (1 to 6).foreach(k => assert(m2(k) == m1(k),
      s"fallback upsert moved id for k=$k: ${m1(k)} -> ${m2(k)}"))
    assert(m2(7) > m1.values.max, "insert must take a fresh identity")
    assert(SnapshotLog.read(spark, root).filter($"k" === 2)
      .select("v").as[String].head() == "V2")
    // keyed delete fallback: survivors keep theirs
    SnapshotLog.deleteByKey(spark, root, Seq(Tuple1(3)).toDF("k"), Seq("k"))
    val m3 = idMap(root)
    assert(m3.size == 6 && !m3.contains(3))
    m3.foreach { case (k, id) => assert(m2(k) == id) }
  }

  test("keyed rewrite fallbacks refuse duplicate-key snapshots instead of multiplying rows") {
    val root = freshRoot()
    // a table written OUTSIDE the keyed-DML contract can legitimately
    // hold duplicate keys; a keyed rewrite's (key → id) re-attach join
    // would then multiply rows (2 old × 2 merged = 4) and cross-attach
    // identities — it must refuse loudly instead
    SnapshotLog.commit(spark, root,
      Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v"))
    SnapshotLog.enableRowTracking(spark, root)
    val e = intercept[IllegalStateException] {
      SnapshotLog.upsert(spark, root, Seq((2, "C")).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // table unmoved: still 3 rows, ids intact
    assert(SnapshotLog.read(spark, root).count() == 3)
    assert(SnapshotLog.readWithRowIds(spark, root)
      .select("_row_id").distinct().count() == 3)
    // NULL keys never match the re-attach equi-join, so duplicated
    // NULLs must NOT trip the refusal — they take fresh ids instead
    val root2 = freshRoot()
    SnapshotLog.commit(spark, root2,
      Seq[(Integer, String)]((null, "a"), (null, "b"), (1, "c"))
        .toDF("k", "v"))
    SnapshotLog.enableRowTracking(spark, root2)
    SnapshotLog.upsert(spark, root2,
      Seq[(Integer, String)]((2, "d")).toDF("k", "v"), Seq("k"))
    assert(SnapshotLog.read(spark, root2).count() == 4)
    assert(SnapshotLog.readWithRowIds(spark, root2)
      .select("_row_id").distinct().count() == 4)
  }

  test("REPLACE commits hand out fresh ids; an id-less replaceWithChanges raises until repaired") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root,
      (1 to 4).map(i => (i, s"v$i")).toDF("k", "v"), statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val m1 = idMap(root)
    // commit() is REPLACE by contract — new content, new identities
    // (assigned, not raising: the caller explicitly replaced the table)
    SnapshotLog.commit(spark, root,
      (1 to 4).map(i => (i, s"w$i")).toDF("k", "v"), statsCols = Seq("k"))
    val m2 = idMap(root)
    assert(m2.size == 4 && m2.values.forall(_ > m1.values.max),
      s"replace must mint fresh identities: $m1 -> $m2")
    // replaceWithChanges WITHOUT the id column cannot know row
    // correspondence — the commit lands but identity reads raise
    // loudly (the documented contract), and enableRowTracking repairs
    SnapshotLog.replaceWithChanges(spark, root,
      (1 to 4).map(i => (i, s"x$i")).toDF("k", "v"))
    val e = intercept[Exception] { idMap(root) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("row-id coverage incomplete")),
      msgs(e).toString)
    assert(SnapshotLog.metaRowCount(spark, root).isEmpty,
      "uncovered files must not answer COUNT(*) from metadata")
    SnapshotLog.enableRowTracking(spark, root)
    val m3 = idMap(root)
    assert(m3.size == 4 && m3.values.forall(_ > m2.values.max))
    assert(SnapshotLog.metaRowCount(spark, root).contains(4L))
  }
}
