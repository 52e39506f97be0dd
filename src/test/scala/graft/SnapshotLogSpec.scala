package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotLog

/** The snapshot-log transactional contract (round-5 VERDICT item 7):
  * readers never observe a half-rewrite — a resolved reader keeps its
  * version while a commit lands, a crash between manifest publish and
  * pointer swap leaves the old version live, and the next writer recovers
  * the debris.
  */
class SnapshotLogSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snaplog").toString + "/table"

  private def kv(pairs: (Int, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("commit/read round-trip, version numbering, time travel") {
    val root = freshRoot()
    assert(SnapshotLog.currentVersion(spark, root).isEmpty)
    val v1 = SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    val v2 = SnapshotLog.commit(spark, root, kv(1 -> "a2", 3 -> "c"))
    assert(v1 == 1L && v2 == 2L)
    assert(SnapshotLog.currentVersion(spark, root).contains(2L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a2", 3 -> "c"))
    // time travel: version 1 is still addressable until vacuumed
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) == Set(1 -> "a", 2 -> "b"))
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
  }

  test("transactional upsert merges by key; first upsert bootstraps the table") {
    val root = freshRoot()
    SnapshotLog.upsert(spark, root, kv(1 -> "a", 2 -> "b"), Seq("k"))
    SnapshotLog.upsert(spark, root, kv(2 -> "B", 3 -> "c"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "B", 3 -> "c"))
    SnapshotLog.deleteByKey(spark, root, Seq(1).toDF("k"), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(2 -> "B", 3 -> "c"))
  }

  test("snapshot isolation: a resolved reader keeps its version across a commit") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "old"))
    // reader resolves NOW (binds to v1's immutable data dir)...
    val pinned = SnapshotLog.read(spark, root)
    // ...a full rewrite lands underneath it...
    SnapshotLog.commit(spark, root, kv(1 -> "new", 2 -> "extra"))
    // ...the pinned reader still sees ONLY v1 — old-or-new, never mixed
    assert(rows(pinned) == Set(1 -> "old"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "new", 2 -> "extra"))
  }

  test("crash between manifest publish and pointer swap leaves the old version live") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "committed"))
    // simulate the crash: steps 1-2 (data dir + manifest) happen, the
    // pointer swap (step 3, the commit point) never does
    SnapshotLog.stageVersion(spark, root, kv(1 -> "torn"), 2L)
    assert(SnapshotLog.currentVersion(spark, root).contains(1L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "committed"),
      "reader observed an uncommitted version")
    // readVersion refuses nothing here (manifest exists) — but the pointer
    // never moved, so normal readers cannot land on it; the NEXT writer
    // removes the debris and reuses the version number
    val v = SnapshotLog.commit(spark, root, kv(1 -> "recovered"))
    assert(v == 2L)
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "recovered"))
    assert(rows(SnapshotLog.readVersion(spark, root, 2L)) == Set(1 -> "recovered"),
      "orphaned v2 data survived recovery")
  }

  test("crash inside the data write (no manifest) is also recovered") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "committed"))
    // data dir exists, manifest never published
    kv(1 -> "torn").write.parquet(root + "/data_v00000002")
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "committed"))
    val v = SnapshotLog.commit(spark, root, kv(1 -> "recovered"))
    assert(v == 2L)
    assert(rows(SnapshotLog.readVersion(spark, root, 2L)) == Set(1 -> "recovered"))
  }

  test("writer claim blocks a second concurrent commit and names the claim file") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a"))
    val claim = new java.io.File(root + "/_graft_log/WRITER_CLAIM")
    assert(claim.createNewFile(), "could not plant claim")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commit(spark, root, kv(1 -> "b"))
    }
    assert(e.getMessage.contains("WRITER_CLAIM"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a"))
    claim.delete()
    SnapshotLog.commit(spark, root, kv(1 -> "b"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "b"))
  }

  test("commitBatch: batchId stamp skips replayed batches, exactly-once table versions") {
    val root = freshRoot()
    assert(SnapshotLog.commitBatch(spark, root, kv(1 -> "a"), Seq("k"), 0L).contains(1L))
    assert(SnapshotLog.commitBatch(spark, root, kv(2 -> "b"), Seq("k"), 1L).contains(2L))
    assert(SnapshotLog.lastBatchId(spark, root).contains(1L))
    // post-crash replay of batch 1: SKIPPED, no new version, table unchanged
    assert(SnapshotLog.commitBatch(spark, root, kv(2 -> "REPLAY"), Seq("k"), 1L).isEmpty)
    assert(SnapshotLog.currentVersion(spark, root).contains(2L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
    // a stale batch id (already superseded) is also skipped
    assert(SnapshotLog.commitBatch(spark, root, kv(9 -> "stale"), Seq("k"), 0L).isEmpty)
    // the next REAL batch proceeds, and a plain (non-batch) commit
    // afterwards clears the stamp
    assert(SnapshotLog.commitBatch(spark, root, kv(3 -> "c"), Seq("k"), 2L).contains(3L))
    SnapshotLog.commit(spark, root, kv(1 -> "compacted"))
    assert(SnapshotLog.lastBatchId(spark, root).isEmpty)
    // streaming commits carry skipping stats like batch commits do
    assert(SnapshotLog.commitBatch(spark, root, kv(5 -> "e"), Seq("k"), 3L,
      statsCols = Seq("k")).contains(5L))
    assert(new java.io.File(root, "_graft_log/v00000005.stats").exists(),
      "streaming commit should publish its stats sidecar")
    assert(rows(SnapshotLog.readBetween(spark, root, "k", 5, 5)) == Set(5 -> "e"))
  }

  test("changesBetween: insert/update/delete feed, empty for equal versions, net across gaps") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b", 3 -> "c"))
    // v2: update 2, delete 3, insert 4, leave 1 untouched
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "B", 4 -> "d"))
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(feed == Set(
      ("update", 2, Some("b"), Some("B")),
      ("delete", 3, Some("c"), None),
      ("insert", 4, None, Some("d"))), feed.toString)
    // identical re-commit → empty feed
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "B", 4 -> "d"))
    assert(SnapshotLog.changesBetween(spark, root, 2L, 3L, Seq("k")).count() == 0)
    // net change across the gap v1→v3 equals the v1→v2 feed (v3 ≡ v2)
    val net = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(net == Set(("update", 2), ("delete", 3), ("insert", 4)), net.toString)
  }

  test("file skipping: narrow range reads a strict subset of files, rows identical to full filter") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    // range-clustered write: 8 tight-span files over ids 0..7999
    val df = spark.range(8000).toDF("id")
      .withColumn("payload", col("id").cast("string"))
      .repartitionByRange(8, col("id"))
    SnapshotLog.commit(spark, root, df, statsCols = Seq("id", "payload"))
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "id", 100, 200)
    assert(total == 8, s"expected 8 files, got $total")
    assert(kept.size < total && kept.nonEmpty,
      s"narrow range should prune files: kept ${kept.size} of $total")
    val pruned = SnapshotLog.readBetween(spark, root, "id", 100, 200)
      .collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == (100L to 200L), s"got ${pruned.length} rows")
    // string-column stats prune too (payload spans follow the range cluster
    // only lexicographically-loosely, so just prove correctness + no loss)
    val viaStr = SnapshotLog.readBetween(spark, root, "payload", "42", "42")
      .collect().map(_.getString(1)).toSeq
    assert(viaStr == Seq("42"))
  }

  test("file skipping: no sidecar keeps every file; all-null files are pruned; empty result keeps schema") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val root = freshRoot()
    // v1 without stats: candidateFiles must keep everything
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    val (k1, t1) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 0, 100)
    assert(k1.size == t1, "no stats must mean no pruning")
    assert(rows(SnapshotLog.readBetween(spark, root, "k", 1, 1)) == Set(1 -> "a"))
    // v2 with stats and an all-null measure in one file region
    val df = spark.range(100).toDF("id")
      .withColumn("m", when(col("id") < 50, col("id")).otherwise(lit(null).cast("long")))
      .repartitionByRange(4, col("id"))
    SnapshotLog.commit(spark, root + "_nulls", df, statsCols = Seq("m"))
    val (k2, t2) = SnapshotLog.candidateFiles(spark, root + "_nulls", 1L, "m", 0, 1000)
    assert(k2.size < t2, s"all-null files should be pruned: kept ${k2.size} of $t2")
    assert(SnapshotLog.readBetween(spark, root + "_nulls", "m", 0, 1000).count() == 50)
    // a range hitting nothing still returns the table schema, zero rows
    val empty = SnapshotLog.readBetween(spark, root + "_nulls", "m", 5000, 6000)
    assert(empty.columns.toSeq == Seq("id", "m") && empty.count() == 0)
  }

  test("file skipping composes with Z-order: narrow ranges on EITHER cluster column prune files") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    // two independent dims over a 100×100 grid — a single-key sort can
    // only tighten per-file spans on one of them; the Morton arrangement
    // tightens both, so stats prune on both
    val df = spark.range(10000).toDF("id")
      .withColumn("x", col("id") % 100)
      // div, not `/`: Spark's `/` is true (double) division
      .withColumn("y", org.apache.spark.sql.functions.expr("id div 100"))
    val arranged = graft.sources.Layout.zArrange(df, Seq("x", "y"), nFiles = 16)
    SnapshotLog.commit(spark, root, arranged, statsCols = Seq("x", "y"))
    val (kx, total) = SnapshotLog.candidateFiles(spark, root, 1L, "x", 10, 15)
    val (ky, _)     = SnapshotLog.candidateFiles(spark, root, 1L, "y", 80, 85)
    assert(total == 16, s"expected 16 files, got $total")
    assert(kx.size < total, s"x-range should prune: kept ${kx.size} of $total")
    assert(ky.size < total, s"y-range should prune: kept ${ky.size} of $total")
    // and the pruned reads are exactly the full-scan filters
    val xs = SnapshotLog.readBetween(spark, root, "x", 10, 15).count()
    val ys = SnapshotLog.readBetween(spark, root, "y", 80, 85).count()
    assert(xs == 6 * 100, s"x rows $xs") // 6 x-values × 100 y-values
    assert(ys == 6 * 100, s"y rows $ys")
    // the conjunction intersects the kept sets and multiplies the
    // selectivities — the Z-order payoff query
    val both = SnapshotLog.readWhere(spark, root,
      Seq(("x", 10, 15), ("y", 80, 85)))
    assert(both.count() == 36, s"6×6 cell, got ${both.count()}")
    val keptBoth = kx.map(_.toString).toSet.intersect(ky.map(_.toString).toSet)
    assert(keptBoth.size <= math.min(kx.size, ky.size))
  }

  test("bloom skipping: point lookups prune hash-distributed keys that min/max cannot") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    // keys shuffled round-robin: every file's [min,max] spans ~the whole
    // domain, so range stats keep everything — the bloom must do the work
    val df = spark.range(8000).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .repartition(8) // hash distribution, no clustering
    SnapshotLog.commit(spark, root, df,
      statsCols = Seq("id"), bloomCols = Seq("key", "id"))
    // range stats alone cannot prune the round-robin id layout
    val (rangeKept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "id", 4242, 4242)
    assert(total == 8 && rangeKept.size == total,
      s"hash layout should defeat min/max: kept ${rangeKept.size} of $total")
    // bloom prunes to ~the one file actually holding the key (false
    // positives allowed — a few extra files — but never ALL files)
    val (bk, _) = SnapshotLog.candidateFilesEquals(spark, root, 1L, "key", "k4242")
    assert(bk.size < total, s"bloom should prune: kept ${bk.size} of $total")
    val (bkNum, _) = SnapshotLog.candidateFilesEquals(spark, root, 1L, "id", 4242L)
    assert(bkNum.size < total, s"numeric bloom should prune: kept ${bkNum.size} of $total")
    // and results are exactly the full-scan filter
    val hit = SnapshotLog.readEquals(spark, root, "key", "k4242").collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 4242L, hit.mkString(";"))
    // an absent key reads zero rows (usually zero files)
    assert(SnapshotLog.readEquals(spark, root, "key", "missing").count() == 0)
    // no bloom for a column → equality read still correct via full keep
    val hit2 = SnapshotLog.readEquals(spark, root, "id", 17L).collect()
    assert(hit2.length == 1 && hit2(0).getString(1) == "k17")
    // type-coercion guard: an Int probe against the LongType bloom must
    // hash as a long (xxhash64 is type-sensitive) — wrong-type hashing
    // would silently prune the true file and LOSE the row
    val hitInt = SnapshotLog.readEquals(spark, root, "id", 4242).collect()
    assert(hitInt.length == 1 && hitInt(0).getString(1) == "k4242",
      s"Int probe on Long column lost the row: ${hitInt.length}")
  }

  test("string stats compare in code-point order: supplementary chars cannot wrongly prune") {
    val root = freshRoot()
    // one file holding U+FFFD and U+1F600: Spark's UTF8String max is 😀
    // (code point 0x1F600 > 0xFFFD), but Java UTF-16 compareTo says
    // "😀" < "�" — a UTF-16 comparator would conclude max < probe
    // and prune the only file that CONTAINS the probe
    val df = kv(1 -> "�", 2 -> "😀").coalesce(1)
    SnapshotLog.commit(spark, root, df, statsCols = Seq("v"))
    val hit = SnapshotLog.readBetween(spark, root, "v", "�", "�").collect()
    assert(hit.length == 1 && hit(0).getInt(0) == 1,
      s"supplementary-char ordering pruned the true file: ${hit.length} rows")
    // and the ASCII fast path still prunes: a range below every value
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "v", " ", "!")
    assert(kept.isEmpty && total == 1, s"kept ${kept.size} of $total")
  }

  test("file skipping: stats sidecar follows vacuum and orphan recovery; escaped values round-trip") {
    val root = freshRoot()
    // tab/newline/backslash in string stats must round-trip the sidecar
    val nasty = Seq((1, "a\tb"), (2, "c\nd"), (3, "e\\f"), (4, "plain"))
      .toDF("k", "v")
    SnapshotLog.commit(spark, root, nasty, statsCols = Seq("v"))
    assert(rows(SnapshotLog.readBetween(spark, root, "v", "a", "z")) ==
      Set(1 -> "a\tb", 2 -> "c\nd", 3 -> "e\\f", 4 -> "plain"))
    // vacuum removes the superseded version's sidecar with its manifest
    SnapshotLog.commit(spark, root, kv(9 -> "x"), statsCols = Seq("k"))
    SnapshotLog.vacuum(spark, root, keep = 1)
    val logDir = new java.io.File(root, "_graft_log")
    val sidecars = logDir.list().filter(_.endsWith(".stats")).toSeq
    assert(sidecars == Seq("v00000002.stats"), sidecars.toString)
    // a crashed writer's staged stats are debris the next commit removes —
    // the version number is then REUSED, and its fresh sidecar (every
    // commit writes one since the round-8 file manifest) must hold the
    // new commit's listing, never the orphan's span lines
    SnapshotLog.stageVersion(spark, root, kv(5 -> "crash"), 3L, statsCols = Seq("k"))
    SnapshotLog.commit(spark, root, kv(6 -> "after"))
    val after = logDir.list().filter(_.endsWith(".stats")).toSeq.sorted
    assert(after == Seq("v00000002.stats", "v00000003.stats"),
      s"orphaned v3 stats should be recovered before v3 is recommitted: $after")
    val v3Lines = scala.io.Source.fromFile(
      new java.io.File(logDir, "v00000003.stats")).getLines().toSeq
    val orphanSpans = v3Lines.filter { l =>
      val p = l.split("\t", -1)
      l.startsWith("data_v00000003/") && p.length == 5 &&
        p(2) != "f" && p(2) != "d"
    }
    assert(orphanSpans.isEmpty,
      s"orphan writer's span lines leaked into the recommitted v3: $orphanSpans")
    assert(rows(SnapshotLog.read(spark, root)) == Set(6 -> "after"))
  }

  test("schema evolution: a widened commit coexists with old versions; time travel keeps old schemas") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a"))
    // v2 adds a column — each version is an independent snapshot, so no
    // retro-rewrite and no reader coordination
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b").withColumn("score", lit(7)))
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v", "score"))
    assert(SnapshotLog.readVersion(spark, root, 1L).columns.toSeq == Seq("k", "v"))
    // the CDC feed refuses a cross-schema diff loudly instead of
    // fabricating NULL-change rows
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.changesBetween(spark, root, 1L, 2L, Seq("k"))
    }
    assert(e.getMessage.contains("schema changed"), e.getMessage)
    // stats work on the new column immediately
    SnapshotLog.commit(spark, root,
      kv(1 -> "a", 2 -> "b").withColumn("score", lit(9)), statsCols = Seq("score"))
    assert(SnapshotLog.readBetween(spark, root, "score", 8, 10).count() == 2)
  }

  test("append chain: each commit writes O(batch), versions read as growing unions") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    // time travel sees each prefix
    assert(rows(SnapshotLog.readVersion(spark, root, 1L)) == Set(1 -> "a"))
    assert(rows(SnapshotLog.readVersion(spark, root, 2L)) == Set(1 -> "a", 2 -> "b"))
    // THE scale fact: v3's own data dir holds ONLY batch 3's rows — the
    // table was never rewritten
    val ownDir = new java.io.File(root, "data_v00000003")
    val ownRows = spark.read.parquet(ownDir.toString).count()
    assert(ownRows == 1, s"append rewrote the table: own dir has $ownRows rows")
    // manifest records the ancestry
    assert(SnapshotLog.dirsOf(spark, root, 3L) ==
      Seq("data_v00000001", "data_v00000002", "data_v00000003"))
    // schema drift is refused loudly on an append chain
    import org.apache.spark.sql.functions.lit
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.appendCommit(spark, root, kv(9 -> "x").withColumn("extra", lit(1)))
    }
    assert(e.getMessage.contains("append schema"), e.getMessage)
  }

  test("append chain: skipping stats are carried forward, O(batch) per commit") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      spark.range(0, 100).toDF("id").coalesce(1), statsCols = Seq("id"))
    SnapshotLog.appendCommit(spark, root,
      spark.range(100, 200).toDF("id").coalesce(1), statsCols = Seq("id"))
    // v2's sidecar contains v1's line VERBATIM (carried, not recomputed)
    def sidecar(v: String) = {
      val src = scala.io.Source.fromFile(new java.io.File(root, s"_graft_log/$v.stats"))
      try src.getLines().toVector finally src.close()
    }
    val v1Lines = sidecar("v00000001")
    val v2Lines = sidecar("v00000002")
    assert(v1Lines.forall(v2Lines.contains), "parent stats not carried forward")
    assert(v2Lines.size > v1Lines.size, "delta stats missing")
    // pruning works ACROSS the chain: a v1-only range keeps 1 of 2 files
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 2L, "id", 10, 20)
    assert(total == 2 && kept.size == 1,
      s"chain pruning kept ${kept.size} of $total")
    assert(SnapshotLog.readBetween(spark, root, "id", 10, 20).count() == 11)
    assert(SnapshotLog.readBetween(spark, root, "id", 150, 160).count() == 11)
  }

  test("append chain: vacuum reference-counts shared dirs; crash recovery removes only the orphan delta") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"))
    // dropping v1 and v2 as VERSIONS must not delete their data dirs —
    // v3 still reads them
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(SnapshotLog.versions(spark, root) == Seq(3L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(new java.io.File(root, "data_v00000001").exists(),
      "vacuum deleted a dir the retained head still reads")
    // a crashed append (staged, never pointed) loses only its OWN delta
    SnapshotLog.stageVersion(spark, root, kv(9 -> "crash"), 4L,
      baseDirs = SnapshotLog.dirsOf(spark, root, 3L))
    assert(new java.io.File(root, "data_v00000004").exists())
    SnapshotLog.appendCommit(spark, root, kv(4 -> "d")) // recovers, then lands as v4
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
  }

  test("append-lineage CDC short-circuit: the feed is the delta dirs, no join planned") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"))
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 3L, Seq("k"))
    val got = feed.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(3))).toSet
    assert(got == Set(("insert", 2, "b"), ("insert", 3, "c")), got.toString)
    // same column surface as the generic keyed diff
    assert(feed.columns.toSeq == Seq("change_type", "k", "old_v", "new_v"))
    // the whole point: O(delta) — no full-outer join in the plan
    val plan = feed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "append feed should not plan a join:\n" + plan)
    // full-snapshot histories keep the exact keyed diff (not a prefix
    // chain → generic path with deletes/updates)
    val root2 = freshRoot()
    SnapshotLog.commit(spark, root2, kv(1 -> "a", 2 -> "b"))
    SnapshotLog.commit(spark, root2, kv(1 -> "a2"))
    val keyed = SnapshotLog.changesBetween(spark, root2, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(keyed == Set(("update", 1), ("delete", 2)), keyed.toString)
  }

  test("appendBatch: replay skipped, exactly-once appends, O(batch) semantics") {
    val root = freshRoot()
    assert(SnapshotLog.appendBatch(spark, root, kv(1 -> "a"), 0L).contains(1L))
    assert(SnapshotLog.appendBatch(spark, root, kv(2 -> "b"), 1L).contains(2L))
    // post-crash replay of batch 1: skipped, nothing appended twice
    assert(SnapshotLog.appendBatch(spark, root, kv(2 -> "REPLAY"), 1L).isEmpty)
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
    assert(SnapshotLog.currentVersion(spark, root).contains(2L))
  }

  test("timestamp stats: event-time ranges prune files, ISO serialization stays chronological") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    // 96 hourly NTZ events over 4 days, range-clustered by time → tight
    // per-file time spans (the event-table layout)
    val df = spark.range(96).toDF("i")
      .withColumn("ts", expr(
        "CAST(timestamp_micros(CAST(1704067200000000 + i * 3600000000 AS LONG)) AS TIMESTAMP_NTZ)"))
      .withColumn("event_id", col("i"))
      .repartitionByRange(8, col("ts"))
    SnapshotLog.commit(spark, root, df, statsCols = Seq("ts"))
    // probe one 6-hour window via LocalDateTime — far fewer than 8 files
    val lo = java.time.LocalDateTime.of(2024, 1, 2, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 1, 2, 6, 0)
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "ts", lo, hi)
    assert(total == 8 && kept.size < total,
      s"time range should prune: kept ${kept.size} of $total")
    val got = SnapshotLog.readBetween(spark, root, "ts", lo, hi)
      .collect().map(_.getAs[Long]("event_id")).sorted.toSeq
    assert(got == (24L to 30L), s"got $got") // hours 24..30 inclusive
    // a pre-range probe prunes everything
    val (none, _) = SnapshotLog.candidateFiles(spark, root, 1L, "ts",
      java.time.LocalDateTime.of(2020, 1, 1, 0, 0),
      java.time.LocalDateTime.of(2020, 1, 2, 0, 0))
    assert(none.isEmpty, s"kept ${none.size} files for a disjoint past range")
  }

  test("compactChain collapses delta dirs into one version; vacuum then reclaims them") {
    val root = freshRoot()
    (1 to 4).foreach(i => SnapshotLog.appendCommit(spark, root, kv(i -> s"v$i")))
    assert(SnapshotLog.dirsOf(spark, root, 4L).size == 4)
    val v5 = SnapshotLog.compactChain(spark, root, nFiles = 1, statsCols = Seq("k"))
    assert(v5 == 5L)
    // one dir, same rows, stats fresh over the compacted layout
    assert(SnapshotLog.dirsOf(spark, root, 5L) == Seq("data_v00000005"))
    assert(rows(SnapshotLog.read(spark, root)) ==
      (1 to 4).map(i => i -> s"v$i").toSet)
    assert(rows(SnapshotLog.readBetween(spark, root, "k", 2, 3)) ==
      Set(2 -> "v2", 3 -> "v3"))
    // pinned history still readable pre-vacuum; vacuum reclaims the chain
    assert(rows(SnapshotLog.readVersion(spark, root, 3L)) ==
      (1 to 3).map(i => i -> s"v$i").toSet)
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(SnapshotLog.versions(spark, root) == Seq(5L))
    assert(!new java.io.File(root, "data_v00000001").exists(),
      "vacuum should reclaim the superseded delta dirs after compaction")
    assert(rows(SnapshotLog.read(spark, root)) ==
      (1 to 4).map(i => i -> s"v$i").toSet)
  }

  test("compactChain zorderBy (OPTIMIZE ZORDER) turns loose spans into pruning stats") {
    val root = freshRoot()
    // ingest in id order: every file then spans the FULL x range (x = id % 100)
    // and the full y range within its slab — x-stats exist but prune nothing
    val df = spark.range(10000).toDF("id")
      .withColumn("x", org.apache.spark.sql.functions.expr("id % 100"))
      .withColumn("y", org.apache.spark.sql.functions.expr("id div 100"))
      .repartition(16) // round-robin: both x and y scatter across every file
    SnapshotLog.commit(spark, root, df, statsCols = Seq("x", "y"))
    val (preX, preT) = SnapshotLog.candidateFiles(spark, root, 1L, "x", 10, 15)
    val (preY, _)    = SnapshotLog.candidateFiles(spark, root, 1L, "y", 80, 85)
    assert(preX.size == preT && preY.size == preT,
      s"precondition: scattered layout must NOT prune (x ${preX.size}, y ${preY.size} of $preT)")
    val v2 = SnapshotLog.compactChain(spark, root, nFiles = 16,
      statsCols = Seq("x", "y"), zorderBy = Seq("x", "y"))
    assert(v2 == 2L)
    val (px, total) = SnapshotLog.candidateFiles(spark, root, 2L, "x", 10, 15)
    val (py, _)     = SnapshotLog.candidateFiles(spark, root, 2L, "y", 80, 85)
    assert(total == 16, s"expected 16 files, got $total")
    assert(px.size < total, s"x-range should prune post-OPTIMIZE: kept ${px.size} of $total")
    assert(py.size < total, s"y-range should prune post-OPTIMIZE: kept ${py.size} of $total")
    // rows are a re-arrangement, never a re-computation
    assert(SnapshotLog.read(spark, root).count() == 10000)
    assert(SnapshotLog.readBetween(spark, root, "x", 10, 15).count() == 6 * 100)
    assert(SnapshotLog.readBetween(spark, root, "y", 80, 85).count() == 6 * 100)
  }

  test("tailChanges: bootstrap, incremental polls, crash re-delivery, independent consumers") {
    val root = freshRoot()
    val cursor = root + "_cursor/tail.cursor"
    import org.apache.spark.sql.Row
    def feedRows(df: DataFrame): Set[(String, Int, String)] =
      df.select("change_type", "k", "new_v").collect()
        .map { case Row(t: String, k: Int, v: String) => (t, k, v) }.toSet

    // nothing committed yet: poll is a no-op, no cursor appears
    assert(SnapshotLog.tailChanges(spark, root, cursor, Seq("k"))((_, _, _) => ()).isEmpty)

    // bootstrap: first poll delivers the WHOLE current snapshot as inserts
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    var got = Set.empty[(String, Int, String)]
    assert(SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) {
      (df, from, to) => got = feedRows(df); assert((from, to) == (0L, 2L))
    }.contains((0L, 2L)))
    assert(got == Set(("insert", 1, "a"), ("insert", 2, "b")))

    // caught up: poll returns None and calls nothing
    assert(SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) {
      (_, _, _) => fail("caught-up poll must not invoke fn")
    }.isEmpty)

    // incremental: only the NEW versions arrive (append short-circuit)
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"))
    assert(SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) {
      (df, _, _) => got = feedRows(df)
    }.contains((2L, 3L)))
    assert(got == Set(("insert", 3, "c")))

    // crash mid-fn: cursor must NOT advance; next poll re-delivers the range
    SnapshotLog.commitBatch(spark, root, kv(3 -> "c2"), Seq("k"), batchId = 99L)
    intercept[RuntimeException] {
      SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) {
        (_, _, _) => throw new RuntimeException("consumer died")
      }
    }
    assert(SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) {
      (df, _, _) => got = feedRows(df)
    }.contains((3L, 4L)))
    assert(got == Set(("update", 3, "c2")), s"keyed diff after re-delivery: $got")

    // a second consumer with its own cursor bootstraps independently
    var other = Set.empty[(String, Int, String)]
    assert(SnapshotLog.tailChanges(spark, root, root + "_cursor/other.cursor", Seq("k")) {
      (df, from, to) => other = feedRows(df); assert((from, to) == (0L, 4L))
    }.contains((0L, 4L)))
    assert(other == Set(("insert", 1, "a"), ("insert", 2, "b"), ("insert", 3, "c2")))
  }

  test("appendEvolved: additive widening at O(batch), pinned schema, old files null-fill") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    val v1files = new java.io.File(root, "data_v00000001").listFiles()
      .map(f => f.getName -> f.lastModified).toMap

    // widen: add a score column — old dirs are untouched, reads null-fill
    val v3 = SnapshotLog.appendEvolved(spark, root,
      kv(3 -> "c").withColumn("score", lit(7)))
    assert(v3 == 3L)
    assert(new java.io.File(root, "data_v00000001").listFiles()
      .map(f => f.getName -> f.lastModified).toMap == v1files,
      "evolution must not rewrite the chain")
    val now = SnapshotLog.read(spark, root)
    assert(now.columns.toSeq == Seq("k", "v", "score"))
    assert(now.collect().map(r => (r.getInt(0), r.getString(1),
      Option(r.get(2)))).toSet ==
      Set((1, "a", None), (2, "b", None), (3, "c", Some(7))))
    // time travel BEFORE the widening keeps the narrow schema
    assert(SnapshotLog.readVersion(spark, root, 2L).columns.toSeq == Seq("k", "v"))

    // the chain's schema IS the widened one now: a narrow append is
    // refused, a widened one rides the plain O(batch) path
    intercept[IllegalArgumentException] {
      SnapshotLog.appendCommit(spark, root, kv(9 -> "x"))
    }
    SnapshotLog.appendCommit(spark, root,
      kv(4 -> "d").withColumn("score", lit(8)))
    assert(SnapshotLog.read(spark, root).count() == 4)

    // the CDC feed spans the evolution boundary in the head's schema
    val feed = SnapshotLog.changesBetween(spark, root, 2L, 4L, Seq("k"))
    assert(feed.columns.contains("new_score"))
    assert(feed.select("k").as[Int].collect().toSet == Set(3, 4))

    // non-additive changes are rewrites, not appends: refuse loudly
    intercept[IllegalArgumentException] { // retype
      SnapshotLog.appendEvolved(spark, root,
        kv(5 -> "e").withColumn("score", lit("seven")))
    }
    intercept[IllegalArgumentException] { // reorder/rename
      SnapshotLog.appendEvolved(spark, root,
        Seq(("e", 5)).toDF("v", "k").withColumn("score", lit(1)))
    }
  }

  test("appendEvolved composes: stats on the new column, compaction materializes nulls, deletes work") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendEvolved(spark, root,
      kv(2 -> "b").withColumn("score", lit(70)), statsCols = Seq("k", "score"))
    SnapshotLog.appendCommit(spark, root,
      kv(3 -> "c").withColumn("score", lit(90)), statsCols = Seq("k", "score"))
    // skipping on the NEW column: the pre-evolution file has no score
    // lines → kept (never wrongly pruned); the post-evolution files prune
    assert(SnapshotLog.readBetween(spark, root, "score", 85, 95)
      .collect().map(_.getInt(0)).toSet == Set(3))
    val (cand, total) = SnapshotLog.candidateFiles(spark, root, 3L, "score", 85, 95)
    assert(total == 3 && cand.size == 2,
      s"v2's score=70 file prunes, v1's no-stats file is kept: $cand")

    // delete by key across the boundary, then bin-pack the chain: the
    // packed file carries the pinned wide schema with nulls materialized
    SnapshotLog.tombstoneDelete(spark, root, Seq(2).toDF("k"), Seq("k"))
    val v5 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 30)
    assert(v5 == 5L)
    assert(SnapshotLog.dirsOf(spark, root, 5L) == Seq("data_v00000005"))
    val out = SnapshotLog.read(spark, root)
    assert(out.columns.toSeq == Seq("k", "v", "score"))
    assert(out.collect().map(r => (r.getInt(0), Option(r.get(2)))).toSet ==
      Set((1, None), (3, Some(90))))
  }

  test("compactSmallFiles bin-packs small delta dirs, carries big dirs by reference") {
    val root = freshRoot()
    // v1: one genuinely big dir; v2..v4: tiny micro-batch delta dirs
    val big = (1000 until 3000).map(i => i -> f"value_$i%06d")
    SnapshotLog.commit(spark, root, kv(big: _*).repartition(2), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"), statsCols = Seq("k"))
    val bigDir = new java.io.File(root, "data_v00000001")
    def bigState() = bigDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val before = bigState()
    val bigBytes = before.values.map(_._1).sum
    assert(bigBytes > 4096, s"fixture big dir must dwarf the deltas ($bigBytes b)")

    val v5 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = bigBytes)
    assert(v5 == 5L)
    // the big dir was never read, rewritten, or moved; deltas are absorbed
    assert(bigState() == before, "kept dir must be byte-identical")
    assert(SnapshotLog.dirsOf(spark, root, 5L) == Seq("data_v00000001", "data_v00000005"))
    assert(new java.io.File(root, "data_v00000005").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1, "3 tiny dirs pack into 1 file")
    assert(rows(SnapshotLog.read(spark, root)) ==
      (big.toSet ++ Set(1 -> "a", 2 -> "b", 3 -> "c")))

    // stats compose: carried big-dir lines + fresh lines for the packed dir
    // (columns inferred from the parent sidecar — no statsCols passed above)
    val (lowProbe, total) = SnapshotLog.candidateFiles(spark, root, 5L, "k", 1, 3)
    assert(total == 3, s"2 kept files + 1 packed, got $total")
    assert(lowProbe.size == 1, s"k in [1,3] lives only in the packed file: $lowProbe")
    val (highProbe, _) = SnapshotLog.candidateFiles(spark, root, 5L, "k", 1500, 1500)
    assert(!highProbe.exists(_.toString.contains("data_v00000005")),
      "packed file must be pruned for a big-dir-only probe")

    // the chain keeps composing: append after compaction, then no-op detection
    SnapshotLog.appendCommit(spark, root, kv(4 -> "d"), statsCols = Seq("k"))
    assert(rows(SnapshotLog.read(spark, root)).contains(4 -> "d"))
    // v6's dirs = [v1, v5, v6]: v5+v6 are small → packs again; then a second
    // pass has only one small dir left and declines to commit anything
    val v7 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = bigBytes)
    assert(v7 == 7L)
    assert(SnapshotLog.compactSmallFiles(spark, root, targetBytes = bigBytes) == 7L,
      "already-compact table must be a no-op")
    assert(SnapshotLog.currentVersion(spark, root).contains(7L))
  }

  test("compactSmallFiles folds deletion vectors; surviving vector rows carry") {
    val root = freshRoot()
    val big = (1000 until 3000).map(i => i -> f"value_$i%06d")
    SnapshotLog.commit(spark, root, kv(big: _*).repartition(2))
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    val bigBytes = new java.io.File(root, "data_v00000001").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // delete one row living in a small delta dir AND one in the big dir
    SnapshotLog.tombstoneDelete(spark, root,
      Seq(1, 1500).toDF("k"), Seq("k"))
    val expect = big.toSet - (1500 -> "value_001500") + (2 -> "b")
    assert(rows(SnapshotLog.read(spark, root)) == expect)

    val v5 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = bigBytes)
    assert(v5 == 5L)
    // folded: the packed dir physically lacks k=1; the big-dir delete
    // SURVIVES as the new version's own (smaller) vector
    assert(rows(SnapshotLog.read(spark, root)) == expect)
    assert(SnapshotLog.tombDirsOf(spark, root, 5L) == Seq("tomb_v00000005"))
    val dv = spark.read.parquet(root + "/tomb_v00000005")
    assert(dv.select("__rel").as[String].collect()
      .forall(_.startsWith("data_v00000001/")),
      "only big-dir positions survive the fold")
    // compaction is data-neutral: the change feed across it is empty
    assert(SnapshotLog.changesBetween(spark, root, 4L, 5L, Seq("k")).isEmpty)

    // vacuum reclaims the absorbed dirs and the old vectors
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(!new java.io.File(root, "data_v00000002").exists)
    assert(!new java.io.File(root, "data_v00000003").exists)
    assert(!new java.io.File(root, "tomb_v00000004").exists)
    assert(new java.io.File(root, "data_v00000001").exists)
    assert(rows(SnapshotLog.read(spark, root)) == expect)
  }

  test("compactSmallFiles on a scoped table packs per-leaf, never across partitions") {
    // round 10: the old blanket refusal became a per-leaf bin-pack —
    // a multi-file leaf packs under the new version, partitioning kept
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")).toDF("k", "v", "p")
        .repartition(3),
      Seq("k"), partitionCol = "p")
    val v2 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 20)
    assert(v2 == 2L)
    val dirs = SnapshotLog.dirsOf(spark, root, 2L)
    assert(dirs.forall(_.contains("__gp=")), s"partitioning lost: $dirs")
    assert(SnapshotLog.read(spark, root).collect().map(_.toSeq).toSet ==
      Set(Seq(1, "a", "p1"), Seq(2, "b", "p1"), Seq(3, "c", "p2")))
  }

  test("timestamp time travel: versionAsOf resolves by commit time, readAsOf reads it") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a"))
    val t1 = SnapshotLog.commitTimeOf(spark, root, 1L)
    SnapshotLog.commit(spark, root, kv(1 -> "a2", 2 -> "b"))
    assert(SnapshotLog.versionAsOf(spark, root, t1).contains(1L))
    assert(rows(SnapshotLog.readAsOf(spark, root, t1)) == Set(1 -> "a"))
    // before the table existed: nothing to resolve
    assert(SnapshotLog.versionAsOf(spark, root, t1.minusSeconds(3600)).isEmpty)
    // now (or any later instant) resolves to the head
    assert(SnapshotLog.versionAsOf(spark, root,
      SnapshotLog.commitTimeOf(spark, root, 2L).plusSeconds(1)).contains(2L))
  }

  test("restore rolls back to an old version at metadata cost; history survives") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "oops"))
    SnapshotLog.appendCommit(spark, root, kv(3 -> "worse"))
    val v4 = SnapshotLog.restore(spark, root, 1L)
    assert(v4 == 4L)
    // zero data movement: the restore commit owns NO data dir
    assert(!new java.io.File(root, "data_v00000004").exists)
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a"))
    // forensics: the bad versions stay addressable until vacuumed
    assert(rows(SnapshotLog.readVersion(spark, root, 3L)) ==
      Set(1 -> "a", 2 -> "oops", 3 -> "worse"))
    // the CDC feed across the restore is the exact undo
    val feed = SnapshotLog.changesBetween(spark, root, 3L, 4L, Seq("k"))
      .select("change_type", "k").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(feed == Set(("delete", 2), ("delete", 3)))
    // life goes on: appends compose on the restored lineage
    SnapshotLog.appendCommit(spark, root, kv(4 -> "d"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 4 -> "d"))
    // vacuum reclaims the rolled-back dirs once unreferenced
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(!new java.io.File(root, "data_v00000002").exists)
    assert(!new java.io.File(root, "data_v00000003").exists)
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 4 -> "d"))
    // restoring to a vacuumed version refuses loudly
    intercept[IllegalArgumentException] {
      SnapshotLog.restore(spark, root, 2L)
    }
  }

  test("restore across an evolution boundary reinstates the narrow pinned schema") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendEvolved(spark, root, kv(2 -> "b").withColumn("score", lit(7)))
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v", "score"))
    SnapshotLog.restore(spark, root, 1L)
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a"))
  }

  test("maintenance commits carry the streaming stamp: the replay gate survives them") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    assert(SnapshotLog.appendBatch(spark, root, kv(1 -> "a"), batchId = 1L).isDefined)
    assert(SnapshotLog.appendBatch(spark, root, kv(2 -> "b"), batchId = 2L).isDefined)
    // delete + bin-pack + evolve + OPTIMIZE between micro-batches
    SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k"))
    assert(SnapshotLog.lastBatchId(spark, root).contains(2L), "delete wiped the stamp")
    SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 30)
    assert(SnapshotLog.lastBatchId(spark, root).contains(2L), "compaction wiped the stamp")
    SnapshotLog.appendEvolved(spark, root, kv(3 -> "c").withColumn("s", lit(1)))
    assert(SnapshotLog.lastBatchId(spark, root).contains(2L), "evolution wiped the stamp")
    SnapshotLog.compactChain(spark, root, nFiles = 1)
    assert(SnapshotLog.lastBatchId(spark, root).contains(2L), "OPTIMIZE wiped the stamp")
    // a post-crash replay of batch 2 must still SKIP after all of that
    assert(SnapshotLog.appendBatch(spark, root,
      kv(2 -> "b").withColumn("s", lit(0)), batchId = 2L).isEmpty)
    assert(SnapshotLog.appendBatch(spark, root,
      kv(4 -> "d").withColumn("s", lit(9)), batchId = 3L).isDefined)

    // RESTORE is the exception by design: rolling back to the batch-1
    // head rolls back batch 2's data, so batch 2 must RE-apply
    val rb = freshRoot()
    SnapshotLog.appendBatch(spark, rb, kv(1 -> "a"), batchId = 1L)
    SnapshotLog.appendBatch(spark, rb, kv(2 -> "junk"), batchId = 2L)
    SnapshotLog.restore(spark, rb, 1L)
    assert(SnapshotLog.lastBatchId(spark, rb).contains(1L))
    assert(SnapshotLog.appendBatch(spark, rb, kv(2 -> "b2"), batchId = 2L).isDefined)
    assert(rows(SnapshotLog.read(spark, rb)) == Set(1 -> "a", 2 -> "b2"))
  }

  test("describeHistory summarizes the commit log; vacuumOlderThan retains by age") {
    import org.apache.spark.sql.functions.lit
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k"))
    SnapshotLog.appendEvolved(spark, root, kv(3 -> "c").withColumn("s", lit(1)))
    SnapshotLog.restore(spark, root, 2L)
    val h = SnapshotLog.describeHistory(spark, root)
      .select("version", "kind", "n_dirs", "n_tomb_dirs", "schema_pinned")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))).toList
    assert(h == List(
      (1L, "commit", 1, 0, false),
      (2L, "append", 2, 0, false),
      (3L, "delete", 2, 1, false),
      (4L, "append", 3, 1, true),
      (5L, "restore", 2, 0, false)), h.toString)

    // age-based retention: everything older than "just after v4" goes,
    // but the head always survives
    val cutoff = SnapshotLog.commitTimeOf(spark, root, 4L).plusMillis(1)
    SnapshotLog.vacuumOlderThan(spark, root, cutoff)
    assert(SnapshotLog.versions(spark, root) == Seq(5L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
    // a cutoff before every commit is a no-op (head retained)
    SnapshotLog.vacuumOlderThan(spark, root,
      java.time.Instant.ofEpochMilli(0))
    assert(SnapshotLog.versions(spark, root) == Seq(5L))
  }

  test("vacuum drops superseded versions, keeps the current one readable") {
    val root = freshRoot()
    (1 to 4).foreach(i => SnapshotLog.commit(spark, root, kv(i -> s"v$i")))
    SnapshotLog.vacuum(spark, root, keep = 2)
    assert(SnapshotLog.versions(spark, root) == Seq(3L, 4L))
    assert(rows(SnapshotLog.read(spark, root)) == Set(4 -> "v4"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readVersion(spark, root, 1L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("a registered consumer pins its range against vacuum; unregistering releases it") {
    val root = freshRoot()
    (1 to 5).foreach(i => SnapshotLog.commit(spark, root, kv(i -> s"v$i")))
    // consumer processed up to v2 — v2..v5 must survive ANY retention
    SnapshotLog.registerConsumer(spark, root, "nightly-sync", 2L)
    assert(SnapshotLog.consumers(spark, root) == Map("nightly-sync" -> 2L))
    // dry run shows the pin-honoring blast radius before the trigger
    assert(SnapshotLog.vacuumDryRun(spark, root, keep = 1) == Seq(1L))
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(SnapshotLog.versions(spark, root) == Seq(2L, 3L, 4L, 5L),
      "vacuum reclaimed a version a registered consumer still needs")
    // the consumer's next poll over the protected range still works —
    // the pin doubles as the tailChanges cursor
    var seen = 0L
    SnapshotLog.tailChanges(spark, root,
      SnapshotLog.consumerCursor(root, "nightly-sync"), Seq("k")) {
      (feed, fromV, toV) => assert(fromV == 2L && toV == 5L); seen = feed.count()
    }
    assert(seen > 0)
    // the successful poll advanced the pin to the head: older versions
    // are now reclaimable without any unregistration
    assert(SnapshotLog.consumers(spark, root) == Map("nightly-sync" -> 5L))
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(SnapshotLog.versions(spark, root) == Seq(5L))
    // unregistered: plain retention applies again
    SnapshotLog.unregisterConsumer(spark, root, "nightly-sync")
    assert(SnapshotLog.consumers(spark, root).isEmpty)
  }

  // Every FileSourceScan under a plan, descending through AQE wrappers
  // (AdaptiveSparkPlanExec/QueryStageExec have no SparkPlan children).
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(fileScans) ++
        other.subqueries.flatMap(fileScans)
  }

  test("rewrite commit derives its stats sidecar with ZERO additional scans of the committed data") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    val rootMark = new org.apache.hadoop.fs.Path(root).toUri.getPath
    // record every successful query execution that SCANNED the table —
    // the round-6 implementation re-read the freshly written version to
    // build min/max and bloom sidecars (a second 100 TB pass on a full
    // rewrite); footer-derived stats must not scan it at all
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val scanned = fileScans(qe.executedPlan)
          .flatMap(_.relation.location.rootPaths.map(_.toUri.getPath))
          .filter(_.contains(rootMark))
        if (scanned.nonEmpty) seen.add(fn + " -> " + scanned.mkString(","))
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = spark.range(4000).toDF("id")
        .withColumn("key", concat(lit("k"), col("id")))
        .repartitionByRange(4, col("id"))
      SnapshotLog.commit(spark, root, df,
        statsCols = Seq("id"), bloomCols = Seq("key"))
      // barrier: ONE deliberate scan; the listener bus is FIFO, so once
      // this event lands, every commit-time event has been processed
      assert(SnapshotLog.read(spark, root).count() == 4000)
      val deadline = System.currentTimeMillis + 30000
      while (seen.isEmpty && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(seen.size == 1,
        s"the commit itself scanned the committed data: $seen")
      // and the footer-derived stats genuinely prune
      val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "id", 100, 200)
      assert(total == 4 && kept.size == 1,
        s"range-clustered footer stats should prune to 1 file: ${kept.size} of $total")
      // the parquet write-time bloom prunes the hash-distributed key too
      val (bk, bt) = SnapshotLog.candidateFilesEquals(spark, root, 1L, "key", "k2345")
      assert(bk.size < bt, s"footer bloom should prune: kept ${bk.size} of $bt")
      assert(SnapshotLog.readEquals(spark, root, "key", "k2345").count() == 1)
    } finally spark.listenerManager.unregister(listener)
  }

  test("lost LATEST pointer: the next writer refuses recovery instead of deleting the table") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a"))
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    // simulate the object-store rename caveat: the pointer file is lost
    // while every manifest and data dir is intact
    val latest = new java.io.File(root + "/_graft_log/LATEST")
    assert(latest.delete(), "could not simulate the lost pointer")
    val e = intercept[IllegalStateException] {
      SnapshotLog.commit(spark, root, kv(9 -> "z"))
    }
    assert(e.getMessage.contains("no LATEST pointer"))
    // the refusal preserved everything: restoring the pointer (the manual
    // recovery the message prescribes) brings the whole table back
    java.nio.file.Files.write(latest.toPath,
      "2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
    assert(SnapshotLog.versions(spark, root) == Seq(1L, 2L))
    // and a writer works again once the pointer is back
    SnapshotLog.commit(spark, root, kv(3 -> "c"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(3 -> "c"))
  }

  test("appendCommit refuses a same-named batch whose column types drifted") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    val drifted = Seq((1L, "b")).toDF("k", "v") // k: bigint, table has int
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.appendCommit(spark, root, drifted)
    }
    assert(e.getMessage.contains("append schema"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a"),
      "the drifted batch must not have landed")
    // same names AND types still appends fine
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    assert(rows(SnapshotLog.read(spark, root)) == Set(1 -> "a", 2 -> "b"))
  }

  test("non-finite double stats keep the file at prune time instead of throwing") {
    val root = freshRoot()
    val df = Seq((1, 1.0), (2, Double.NaN), (3, 8.0),
                 (4, Double.PositiveInfinity)).toDF("k", "x")
    // Spark's max() returns NaN when any value is NaN (NaN sorts greatest),
    // and Infinity round-trips as a string BigDecimal cannot parse — both
    // must degrade to "keep the file", never to a prune-time exception
    SnapshotLog.commit(spark, root, df.repartition(2), statsCols = Seq("x"))
    val got = SnapshotLog.readBetween(spark, root, "x", 0.5, 2.0)
      .select("k").as[Int].collect().toSet
    assert(got == Set(1), s"expected only k=1 in [0.5, 2.0], got $got")
  }

  test("LTZ timestamp probes render in the session timezone, not hard-coded UTC") {
    val base = 1767225600L // 2026-01-01T00:00:00Z
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try {
      val root = freshRoot()
      import org.apache.spark.sql.functions.col
      // LTZ stats serialize as SESSION-zone wall-clock strings; under the
      // old hard-coded-UTC probe rendering a Sydney session shifted every
      // probe window 11 h low and silently pruned the matching files
      val df = Seq.tabulate(64)(i =>
          (i, java.time.Instant.ofEpochSecond(base + i * 3600L)))
        .toDF("k", "ts").repartitionByRange(8, col("ts"))
      SnapshotLog.commit(spark, root, df, statsCols = Seq("ts"))
      val (lo, hi) = (java.time.Instant.ofEpochSecond(base + 30 * 3600L),
                      java.time.Instant.ofEpochSecond(base + 33 * 3600L))
      val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "ts", lo, hi)
      assert(kept.size < total, "a 3-hour window over 8 range-files must prune")
      val got = SnapshotLog.readBetween(spark, root, "ts", lo, hi)
        .select("k").as[Int].collect().toSet
      assert(got == (30 to 33).toSet, s"rows lost to a zone-shifted probe: $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
