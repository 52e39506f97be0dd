package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round 11 (the r10 verdict's #3): the partition transform set widens
  * from identity + days() to the full Iceberg ladder — years / months /
  * days / hours time transforms (zone-pinnable over LTZ) plus
  * bucket(N, col) for high-cardinality keys. Everything composes with
  * the spec-agnostic scoped machinery (touched-set, OCC disjointness,
  * vacuum refcounts, untouched-leaf byte identity); what's new per
  * transform is the PRUNING rule: period spans for the time transforms,
  * hash re-derivation for bucket equality/IN point probes.
  */
class GpTransformSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_gpx").toString + "/t"

  private def ts(s: String) = Timestamp.valueOf(s)

  private def leafsOf(root: String, v: Long): Seq[String] =
    SnapshotLog.dirsOf(spark, root, v)
      .map(d => d.substring(d.lastIndexOf('/') + 1)).sorted

  test("bucket(4, k): stable leaf per bucket, equality point probe prunes to ONE leaf") {
    val root = freshRoot()
    val batch = (0 until 40).map(k => (k.toLong, s"v$k")).toDF("k", "v")
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "bucket(4, k)")
    val leafs = leafsOf(root, 1L)
    assert(leafs.size == 4 && leafs.forall(_.startsWith("__gp=")), leafs)
    // spec round-trips through the manifest
    assert(SnapshotLog.parseGpSpec("bucket(4,k)").comps.head.n == 4)
    // equality probe: exactly one bucket's leaf survives, rows exact
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 7L, 7L)
    assert(total >= 4, s"expected >= 4 files, got $total")
    val keptLeafs = kept.map(_.getParent.getName).toSet
    assert(keptLeafs.size == 1, s"bucket probe kept leafs $keptLeafs")
    assert(SnapshotLog.readEquals(spark, root, "k", 7L)
      .select("v").as[String].collect().toSeq == Seq("v7"))
    // an Int probe against the Long column must hash AS LONG (cast first)
    val (keptInt, _) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 7, 7)
    assert(keptInt.map(_.getParent.getName).toSet == keptLeafs,
      "int probe hashed differently than the long column")
    // a RANGE probe cannot use bucket dirs — everything keeps (no wrong prune)
    val (keptRange, totalR) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 5L, 9L)
    assert(keptRange.size == totalR)
    assert(SnapshotLog.readBetween(spark, root, "k", 5L, 9L).count() == 5)
    // pushed-down equality through the pruned scan prunes files too
    // (numFiles posts on the execution that computes selectedPartitions)
    val scan = SnapshotLog.readPruned(spark, root).filter($"k" === 7L)
    assert(scan.select("v").as[String].collect().toSeq == Seq("v7"))
    val scans = scan.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles < total, s"scan read $numFiles of $total files")
  }

  test("bucket upsert rewrites only the touched bucket; untouched leafs byte-identical; OCC disjoint buckets both land") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      (0 until 40).map(k => (k.toLong, s"v$k")).toDF("k", "v"),
      Seq("k"), "bucket(4, k)")
    def filesOf(leaf: String): Map[String, Long] = {
      val d = new java.io.File(s"$root/data_v00000001/$leaf")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val touchedLeaf = {
      val (kept, _) = SnapshotLog.candidateFiles(spark, root, 1L, "k", 7L, 7L)
      kept.head.getParent.getName
    }
    val before = leafsOf(root, 1L).filterNot(_ == touchedLeaf)
      .map(l => l -> filesOf(l)).toMap
    SnapshotLog.upsertScoped(spark, root,
      Seq((7L, "V7")).toDF("k", "v"), Seq("k"), "bucket(4, k)")
    // untouched buckets carried by reference, byte/mtime identical
    before.foreach { case (l, files) => assert(filesOf(l) == files, s"$l moved") }
    val v2own = leafsOf(root, 2L).filter(_ == touchedLeaf)
    assert(v2own.nonEmpty)
    assert(SnapshotLog.readEquals(spark, root, "k", 7L)
      .select("v").as[String].head() == "V7")
    assert(SnapshotLog.read(spark, root).count() == 40)
    // OCC: two writers staging DISJOINT buckets both publish
    val k1 = 0L; val k2 = 1L // hash to different buckets with N=4? verify:
    val b1 = SnapshotLog.stageScopedOcc(spark, root,
      Seq((k1, "occ1")).toDF("k", "v"), Seq("k"), "bucket(4, k)")
    val b2 = SnapshotLog.stageScopedOcc(spark, root,
      Seq((k2, "occ2")).toDF("k", "v"), Seq("k"), "bucket(4, k)")
    if (b1.touched == b2.touched) {
      // same bucket: the second must abort (overlap), first lands
      SnapshotLog.publishScopedOcc(spark, root, b1)
      intercept[java.util.ConcurrentModificationException] {
        SnapshotLog.publishScopedOcc(spark, root, b2)
      }
    } else {
      SnapshotLog.publishScopedOcc(spark, root, b1)
      SnapshotLog.publishScopedOcc(spark, root, b2)
      assert(SnapshotLog.readEquals(spark, root, "k", k2)
        .select("v").as[String].head() == "occ2")
    }
    assert(SnapshotLog.readEquals(spark, root, "k", k1)
      .select("v").as[String].head() == "occ1")
  }

  test("months()/years()/hours() over NTZ: period leafs, range probes prune to the period") {
    val root = freshRoot()
    val batch = Seq(
      (1L, "2024-01-05 10:30:00"), (2L, "2024-01-20 23:10:00"),
      (3L, "2024-02-01 00:00:00"), (4L, "2024-03-31 12:00:00"))
      .toDF("k", "s")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "months(ts)")
    assert(leafsOf(root, 1L) ==
      Seq("__gp=2024-01", "__gp=2024-02", "__gp=2024-03"))
    // a probe inside January keeps only the January leaf
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 1L, "ts",
      java.time.LocalDateTime.parse("2024-01-10T00:00"),
      java.time.LocalDateTime.parse("2024-01-25T00:00"))
    assert(kept.map(_.getParent.getName).toSet == Set("__gp=2024-01"),
      s"kept ${kept.map(_.getParent.getName)} of $total")
    // years()
    val rootY = freshRoot()
    SnapshotLog.upsertScoped(spark, rootY,
      batch.withColumn("ts", expr("ts + interval 0 days")), Seq("k"), "years(ts)")
    assert(leafsOf(rootY, 1L) == Seq("__gp=2024"))
    // hours()
    val rootH = freshRoot()
    SnapshotLog.upsertScoped(spark, rootH, batch, Seq("k"), "hours(ts)")
    assert(leafsOf(rootH, 1L) == Seq("__gp=2024-01-05 10",
      "__gp=2024-01-20 23", "__gp=2024-02-01 00", "__gp=2024-03-31 12"))
    val (keptH, totalH) = SnapshotLog.candidateFiles(spark, rootH, 1L, "ts",
      java.time.LocalDateTime.parse("2024-01-20T23:00"),
      java.time.LocalDateTime.parse("2024-01-20T23:59:59"))
    assert(keptH.map(_.getParent.getName).toSet == Set("__gp=2024-01-20 23"),
      s"kept ${keptH.map(_.getParent.getName)} of $totalH")
  }

  test("months() over pinned LTZ: writer-zone-independent identity, instant-exact pruning") {
    val root = freshRoot()
    val batch = Seq((1L, ts("2024-01-15 12:00:00")), (2L, ts("2024-02-15 12:00:00")))
      .toDF("k", "ts")
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "months(ts@UTC)")
    assert(leafsOf(root, 1L) == Seq("__gp=2024-01", "__gp=2024-02"))
    // the pin survives in the manifest and later writers inherit it
    val batch2 = Seq((3L, ts("2024-01-20 08:00:00"))).toDF("k", "ts")
    SnapshotLog.upsertScoped(spark, root, batch2, Seq("k"), "months(ts)")
    assert(leafsOf(root, 2L).contains("__gp=2024-01"))
    // instant probe prunes to the month (session zone is UTC in tests)
    val (kept, total) = SnapshotLog.candidateFiles(spark, root, 2L, "ts",
      java.time.Instant.parse("2024-02-01T00:00:00Z"),
      java.time.Instant.parse("2024-02-28T00:00:00Z"))
    assert(kept.map(_.getParent.getName).toSet == Set("__gp=2024-02"),
      s"kept ${kept.map(_.getParent.getName)} of $total")
  }

  test("bucket NULL keys refuse; composite bucket+months spec renders and prunes per component") {
    val root = freshRoot()
    intercept[Exception] {
      SnapshotLog.upsertScoped(spark, root,
        Seq[(Option[Long], String)]((None, "x")).toDF("k", "v"),
        Seq("v"), "bucket(4, k)")
    }
    val rootC = freshRoot()
    val batch = Seq(
      (1L, "2024-01-05 10:00:00"), (2L, "2024-02-05 10:00:00"),
      (17L, "2024-01-09 10:00:00"))
      .toDF("k", "s").withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    SnapshotLog.upsertScoped(spark, rootC, batch, Seq("k"),
      "bucket(8, k),months(ts)")
    val leafs = leafsOf(rootC, 1L)
    assert(leafs.forall(l => l.matches("__gp=\\d+\\|2024-\\d{2}")), leafs)
    // the months component prunes on ts even with the bucket in front
    val (kept, total) = SnapshotLog.candidateFiles(spark, rootC, 1L, "ts",
      java.time.LocalDateTime.parse("2024-02-01T00:00"),
      java.time.LocalDateTime.parse("2024-02-28T00:00"))
    assert(kept.map(_.getParent.getName).forall(_.endsWith("2024-02")),
      s"kept ${kept.map(_.getParent.getName)} of $total")
    // and the bucket component prunes on k equality
    val (keptK, totalK) = SnapshotLog.candidateFiles(spark, rootC, 1L, "k", 17L, 17L)
    assert(keptK.size < totalK, s"kept ${keptK.size} of $totalK")
    assert(SnapshotLog.readEquals(spark, rootC, "k", 17L).count() == 1)
  }

  test("partition spec evolution (round 13): days(d) → (region, days(d)) — metadata commit, migrate-on-touch") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-01-01")
    val d2 = java.sql.Date.valueOf("2026-01-02")
    val batch0 = Seq(
      (1, "us", d1, "a"), (2, "eu", d1, "b"),
      (3, "us", d2, "c"), (4, "eu", d2, "d"))
      .toDF("k", "region", "d", "v")
    SnapshotLog.upsertScoped(spark, root, batch0, Seq("k"), "days(d)",
      statsCols = Seq("k"))
    def leafFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
        .filter(_.getPath.contains("__gp="))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val filesBefore = leafFiles()
    // the evolution commit is METADATA-ONLY: zero data files move
    val vE = SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    assert(leafFiles() == filesBefore, "repartitionSpec touched data files")
    assert(leafsOf(root, vE) == Seq("__gp=2026-01-01", "__gp=2026-01-02"))
    // re-running with the same spec is a no-op
    assert(SnapshotLog.repartitionSpec(spark, root, "region, days(d)") == vE)
    def rows(): Set[(Int, String, String)] =
      SnapshotLog.read(spark, root).select("k", "region", "v").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(rows() == Set((1, "us", "a"), (2, "eu", "b"),
      (3, "us", "c"), (4, "eu", "d")))
    // pruning stays live on both specs: the day probe prunes old-spec
    // leafs, and never mis-prunes
    val (keptD, totalD) = SnapshotLog.candidateFiles(spark, root, vE, "d", d1, d1)
    assert(keptD.size < totalD && keptD.forall(
      _.getParent.getName == "__gp=2026-01-01"), s"$keptD of $totalD")
    // migrate-on-touch: a keyed merge into day 1 migrates that old
    // leaf's rows into (region, day) leafs; day 2's leaf is untouched
    // byte-for-byte
    val day2Before = leafFiles().filter(_._1.contains("__gp=2026-01-02"))
    val vM = SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "A"), (5, "ap", d1, "e")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    assert(leafFiles().filter(_._1.contains("__gp=2026-01-02")) == day2Before,
      "untouched old-spec leaf moved")
    val leafs = leafsOf(root, vM)
    assert(leafs.contains("__gp=2026-01-02"), leafs.toString)
    assert(leafs.count(_.contains("|2026-01-01")) == 3, // us, eu, ap under new spec
      s"day-1 rows must migrate to composite leafs: $leafs")
    assert(!leafs.contains("__gp=2026-01-01"), s"old day-1 leaf must retire: $leafs")
    assert(rows() == Set((1, "us", "A"), (2, "eu", "b"),
      (3, "us", "c"), (4, "eu", "d"), (5, "ap", "e")))
    // region (new-spec column) prunes the migrated leafs; day-2 rows
    // (old spec, no region in dir) conservatively keep — exact reads
    assert(SnapshotLog.readEquals(spark, root, "region", "ap")
      .select("k").as[Int].collect().toSeq == Seq(5))
    val (keptR, totalR) = SnapshotLog.candidateFiles(spark, root, vM,
      "region", "ap", "ap")
    assert(keptR.size < totalR, s"kept ${keptR.size} of $totalR")
    // a later merge into a migrated composite leaf: classic single-leaf
    // touch, everything else byte-identical
    val before2 = leafFiles().filterNot(_._1.contains("|2026-01-01"))
    SnapshotLog.upsertScoped(spark, root,
      Seq((2, "eu", d1, "B")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    assert(leafFiles().filterNot(_._1.contains("|2026-01-01")) == before2)
    assert(rows() == Set((1, "us", "A"), (2, "eu", "B"),
      (3, "us", "c"), (4, "eu", "d"), (5, "ap", "e")))
    // a stale-spec caller refuses loudly instead of duplicating keys
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.upsertScoped(spark, root,
        Seq((9, "us", d1, "z")).toDF("k", "region", "d", "v"),
        Seq("k"), "days(d)")
    }
    assert(e.getMessage.contains("repartitioned"), e.getMessage)

    // ARITY-DECREASING evolution is the dangerous pruning case: the old
    // composite leafs must never be misread as single-component values
    val vE2 = SnapshotLog.repartitionSpec(spark, root, "days(d)")
    assert(rows().size == 5)
    // day probe: must NOT prune away composite day-1 leafs it can parse
    assert(SnapshotLog.readBetween(spark, root, "d", d1, d1).count() == 3)
    // region probe: old composite dirs carry region; single-spec dirs
    // don't — reads stay exact either way
    assert(SnapshotLog.readEquals(spark, root, "region", "eu")
      .select("k").as[Int].collect().toSet == Set(2, 4))
    // keyed merge after the second evolution: exactly the composite
    // leaf the batch's key lives in collapses back into a day leaf;
    // the other composite leafs stay untouched (migrate-on-TOUCH)
    val vM2 = SnapshotLog.upsertScoped(spark, root,
      Seq((5, "ap", d1, "E")).toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    assert(rows() == Set((1, "us", "A"), (2, "eu", "B"),
      (3, "us", "c"), (4, "eu", "d"), (5, "ap", "E")))
    val leafs2 = leafsOf(root, vM2)
    assert(leafs2.contains("__gp=2026-01-01") &&
      !leafs2.exists(_.contains("ap%7C2026-01-01")) &&
      !leafs2.exists(_.contains("ap|2026-01-01")) &&
      leafs2.count(_.contains("2026-01-01")) == 3, leafs2.toString)
  }

  test("mixed-spec pruning holds in the parquet-checkpoint sidecar regime (round 13)") {
    val root = freshRoot()
    val key = "graft.stats.checkpointThresholdBytes"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "0") // force every sidecar into the pq checkpoint
    try {
      val d1 = java.sql.Date.valueOf("2026-03-01")
      val d2 = java.sql.Date.valueOf("2026-03-02")
      SnapshotLog.upsertScoped(spark, root,
        Seq((1, "us", d1, "a"), (2, "eu", d1, "b"), (3, "us", d2, "c"))
          .toDF("k", "region", "d", "v"),
        Seq("k"), "days(d)", statsCols = Seq("k"))
      SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
      SnapshotLog.upsertScoped(spark, root,
        Seq((4, "ap", d2, "e")).toDF("k", "region", "d", "v"),
        Seq("k"), "region,days(d)", statsCols = Seq("k"))
      // reads stay exact through the checkpointed index on mixed specs
      assert(SnapshotLog.readEquals(spark, root, "region", "us")
        .select("k").as[Int].collect().toSet == Set(1, 3))
      assert(SnapshotLog.readBetween(spark, root, "d", d1, d1).count() == 2)
      assert(SnapshotLog.readEquals(spark, root, "k", 4)
        .select("v").as[String].collect().toSeq == Seq("e"))
      // the pushed-down pruned scan also reads exactly (distributed
      // span eval + multi-spec dir spans agree with the driver path)
      assert(SnapshotLog.readPruned(spark, root)
        .filter(col("d") === d2).count() == 2)
      // the d probe prunes at least the un-matching old day leaf
      val v = SnapshotLog.currentVersion(spark, root).get
      val (kept, total) = SnapshotLog.candidateFiles(spark, root, v, "d", d1, d1)
      assert(kept.size < total, s"kept ${kept.size} of $total")
    } finally {
      prior match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("keyless identity CDC stays exact across a spec-evolving migration (round 13)") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-04-01")
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "a"), (2, "eu", d1, "b"), (3, "ap", d1, "c"))
        .toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    val v1 = SnapshotLog.currentVersion(spark, root).get
    val before = SnapshotLog.readWithRowIds(spark, root)
      .select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    val v2 = SnapshotLog.currentVersion(spark, root).get
    // the evolution commit itself is CDC-silent
    assert(SnapshotLog.changesByRowId(spark, root, v1, v2).isEmpty)
    // a migrating merge: ONE updated row; the carried rows that moved
    // between leafs must stay silent (identities + bytes unchanged)
    SnapshotLog.upsertScoped(spark, root,
      Seq((2, "eu", d1, "B")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    val v3 = SnapshotLog.currentVersion(spark, root).get
    val chg = SnapshotLog.changesByRowId(spark, root, v2, v3)
      .select("k", "v", "_row_id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(chg == Set(
      (2, "b", before(2), "update_preimage"),
      (2, "B", before(2), "update_postimage")), chg.toString)
  }

  test("scoped maintenance packs per spec generation on evolved lineages (round 13)") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-05-01")
    val d2 = java.sql.Date.valueOf("2026-05-02")
    val d3 = java.sql.Date.valueOf("2026-05-03")
    val d4 = java.sql.Date.valueOf("2026-05-04")
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "a"), (2, "eu", d2, "b"), (3, "ap", d3, "c"),
          (4, "eu", d2, "b4"), (5, "jp", d4, "e"))
        .toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    // touch ONLY day 1: its leaf migrates to a composite; days 2-4
    // stay under the OLD spec — a genuinely mixed lineage
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "A")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    def rowSeq(): Seq[(Int, String)] =
      SnapshotLog.read(spark, root).select("k", "v").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
    def rows(): Set[(Int, String)] = rowSeq().toSet
    def noDupes(tag: String): Unit =
      assert(rowSeq().length == rows().size, s"$tag duplicated keys: ${rowSeq().sorted}")
    val expected = Set((1, "A"), (2, "b"), (3, "c"), (4, "b4"), (5, "e"))
    assert(rows() == expected)
    // compaction on the MIXED lineage: every packed leaf keeps its own
    // generation's name — old-spec day leafs stay day leafs, composite
    // leafs stay composite; rows exact
    val v = SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 20)
    val leafs = leafsOf(root, v)
    assert(leafs.toSet == Set("__gp=2026-05-02", "__gp=2026-05-03",
      "__gp=2026-05-04", "__gp=us%7C2026-05-01") ||
      leafs.toSet == Set("__gp=2026-05-02", "__gp=2026-05-03",
        "__gp=2026-05-04", "__gp=us|2026-05-01"), leafs.toString)
    assert(rows() == expected, "mixed-spec compaction lost rows")
    // REGRESSION (round-13 hardening): the packed old-spec leafs live
    // under the MAINTENANCE version's dir, whose manifest records the
    // HEAD spec — without the per-leaf override a later keyed merge
    // would not see them as old-spec, leave the old copy untouched,
    // insert the batch row into a new leaf, and the key would exist
    // twice. Touch a key living in a PACKED old-spec leaf and assert
    // the merge migrated it (exactly one copy, updated value).
    SnapshotLog.upsertScoped(spark, root,
      Seq((5, "jp", d4, "E2")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    noDupes("compaction-packed old-spec leaf")
    assert(rows() == expected - ((5, "e")) + ((5, "E2")), rowSeq().sorted.toString)
    // a DV delete + purge hitting an OLD-spec leaf with a SURVIVOR:
    // per-generation rewrite, the dead row gone, everything else exact
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(2)).toDF("k"), Seq("k"))
    SnapshotLog.purgeDeletedRows(spark, root)
    assert(rows() == expected - ((2, "b")) - ((5, "e")) + ((5, "E2")),
      rowSeq().sorted.toString)
    val head = SnapshotLog.currentVersion(spark, root).get
    assert(SnapshotLog.tombDirsOf(spark, root, head).isEmpty)
    assert(leafsOf(root, head).contains("__gp=2026-05-03"),
      "purge must not migrate untouched old-spec leafs")
    // purge's rewritten old-spec leafs carry the override too: touching
    // the SURVIVOR of the purged leaf must migrate it, not duplicate it
    SnapshotLog.upsertScoped(spark, root,
      Seq((4, "eu", d2, "B4")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    noDupes("purge-rewritten old-spec leaf")
    assert(rows() == Set((1, "A"), (3, "c"), (4, "B4"), (5, "E2")),
      rowSeq().sorted.toString)
    // the override survives VACUUM of its recording manifest: the
    // packed day-03 leaf carries by reference long after the
    // compaction's manifest ages out, and the durable LEAFSPECS
    // history must keep attributing it to the OLD spec or this touch
    // duplicates key 3
    SnapshotLog.vacuum(spark, root, keep = 1)
    SnapshotLog.upsertScoped(spark, root,
      Seq((3, "ap", d3, "C3")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    noDupes("vacuumed-manifest packed old-spec leaf")
    assert(rows() == Set((1, "A"), (3, "C3"), (4, "B4"), (5, "E2")),
      rowSeq().sorted.toString)
  }

  test("vacuum prunes LEAFSPECS entries for dirs no retained version references (round 14)") {
    val root = freshRoot()
    val d2 = java.sql.Date.valueOf("2026-05-02")
    val d3 = java.sql.Date.valueOf("2026-05-03")
    // fragment each day leaf into one file per row so the bin-pack has
    // something to pack
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d2, "a"), (3, "us", d2, "c"),
          (2, "eu", d3, "b"), (4, "eu", d3, "d")).toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    // pack the old-spec leafs under a maintenance version: durable
    // per-leaf overrides land in LEAFSPECS
    SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 20)
    assert(SnapshotLog.leafSpecHist(spark, root).nonEmpty,
      "expected packed old-spec leafs to record durable overrides")
    // migrate EVERY old-spec row to the new spec (migrate-on-touch):
    // the head version now references only composite leafs
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d2, "A"), (2, "eu", d3, "B"),
          (3, "us", d2, "C"), (4, "eu", d3, "D")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    // vacuum reclaims the packed old-spec dirs — and with them their
    // LEAFSPECS lines, so the file stays O(live mixed-spec leafs)
    // instead of growing forever (round 14 — ADVICE r13)
    SnapshotLog.vacuum(spark, root, keep = 1)
    assert(SnapshotLog.leafSpecHist(spark, root).isEmpty,
      SnapshotLog.leafSpecHist(spark, root).toString)
    val rows = SnapshotLog.read(spark, root).select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "A"), (2, "B"), (3, "C"), (4, "D")))
  }

  test("optimizeZorderScoped: per-leaf z-clustering keeps leaf names and tightens stats pruning") {
    val root = freshRoot()
    // 4 ingestion batches per region, values interleaved so every
    // pre-zorder file spans (almost) the whole (a, b) domain
    def batch(off: Int) = (0 until 100).map { j =>
      val i = off * 100 + j
      (i, if (i % 2 == 0) "us" else "eu", (i * 37) % 400, (i * 91) % 400)
    }.toDF("k", "region", "a", "b")
    // fragment each leaf into many small files (the layout a year of
    // micro-batches leaves behind)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "40")
    try (0 until 4).foreach(off => SnapshotLog.upsertScoped(spark, root,
      batch(off), Seq("k"), "region", statsCols = Seq("a", "b")))
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    // a DV delete folds into the rewrite
    SnapshotLog.tombstoneDelete(spark, root, Seq(Tuple1(7)).toDF("k"), Seq("k"))
    val cur = SnapshotLog.currentVersion(spark, root).get
    val (keptBefore, totalBefore) =
      SnapshotLog.candidateFiles(spark, root, cur, "a", 10, 30)
    assert(totalBefore >= 8, s"need a fragmented layout, got $totalBefore files")
    assert(keptBefore.size == totalBefore,
      "interleaved ingestion should leave every file's span wide")
    val v = SnapshotLog.optimizeZorderScoped(spark, root, Seq("a", "b"),
      filesPerLeaf = 4, statsCols = Seq("a", "b"))
    // leaf NAMES stable — dir-name partition pruning survives
    assert(leafsOf(root, v).toSet == Set("__gp=us", "__gp=eu"))
    // rows exact, the deleted row folded (no vectors at the head)
    val rows = SnapshotLog.read(spark, root).select("k").collect()
      .map(_.getInt(0)).toSet
    assert(rows == (0 until 400).toSet - 7)
    assert(SnapshotLog.tombDirsOf(spark, root, v).isEmpty)
    // the point of the exercise: the same narrow range now prunes
    val (keptAfter, totalAfter) =
      SnapshotLog.candidateFiles(spark, root, v, "a", 10, 30)
    assert(totalAfter >= 4, s"z-budget collapsed to $totalAfter files")
    assert(keptAfter.size < totalAfter,
      s"z-order did not tighten spans: ${keptAfter.size}/$totalAfter kept")
    assert(keptAfter.size < keptBefore.size)
    // the SQL surface routes scoped tables here (leaf layout preserved)
    // — exercised through the proc in SqlSurfaceSpec's zorder case
  }

  test("rename/drop/widen refuse HISTORICAL spec source columns on evolved lineages") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-06-01")
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "a")).toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    // evolve AWAY from d: the head spec no longer references it, but
    // the old-spec leaf still renders and migrates through it — a
    // rename would break maintenance, and a freed-then-rebound name
    // would silently re-home rows
    SnapshotLog.repartitionSpec(spark, root, "region")
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(spark, root, "d", "ts")
    }
    assert(e1.getMessage.contains("historical"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(spark, root, "d")
    }
    assert(e2.getMessage.contains("historical"), e2.getMessage)
    // a column never referenced by ANY spec renames fine
    SnapshotLog.renameColumn(spark, root, "v", "val")
    assert(SnapshotLog.read(spark, root).columns.contains("val"))
  }

  test("generated partition columns prune on base-column point probes (round 13)") {
    val root = freshRoot()
    val batch = Seq(("aa-1", 1), ("aa-2", 2), ("bb-1", 3), ("cc-9", 4))
      .toDF("v", "k").withColumn("cat", substring(col("v"), 1, 2))
    SnapshotLog.upsertScoped(spark, root, batch, Seq("k"), "cat",
      statsCols = Seq("k"))
    graft.sources.Generated.add(spark, root, "cat", "substring(v, 1, 2)")
    val ver = SnapshotLog.currentVersion(spark, root).get
    // a point probe on the BASE column derives cat = substring(X, 1, 2)
    // and prunes to that leaf — the Delta generated-partition trick
    val (kept, total) = SnapshotLog.candidateFilesEquals(
      spark, root, ver, "v", "bb-1")
    assert(kept.size < total &&
      kept.forall(_.getParent.getName == "__gp=bb"),
      s"kept ${kept.map(_.getParent.getName)} of $total")
    assert(SnapshotLog.readEquals(spark, root, "v", "bb-1")
      .select("k").as[Int].collect().toSeq == Seq(3))
    // pushdown through the pruned scan: the index expands the compiled
    // equality into a derived conjunct on cat
    def numFilesOf(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten.map(_.metrics("numFiles").value).sum
    }
    val eq = SnapshotLog.readPruned(spark, root).filter($"v" === "aa-2")
    assert(eq.select("k").as[Int].collect().toSeq == Seq(2))
    assert(numFilesOf(SnapshotLog.readPruned(spark, root)
      .filter($"v" === "aa-2").select("k")) < total,
      "equality on the base column must prune generated-partition leafs")
    val in = SnapshotLog.readPruned(spark, root)
      .filter($"v".isin("aa-1", "cc-9")).select("k")
    assert(in.as[Int].collect().toSet == Set(1, 4))
    assert(numFilesOf(in) < total, "IN on the base column must prune")
    // a NON-matching probe value still reads exactly (empty, no error)
    assert(SnapshotLog.readEquals(spark, root, "v", "zz-0").count() == 0)
    // zone-sensitive derivations never prune (and never mis-prune):
    // a date_format-generated partition keeps reading exactly
    val rootZ = freshRoot()
    val bz = Seq((java.sql.Timestamp.valueOf("2026-01-05 10:00:00"), 1),
                 (java.sql.Timestamp.valueOf("2026-02-06 11:00:00"), 2))
      .toDF("ts", "k")
      .withColumn("mon", date_format(col("ts"), "yyyy-MM"))
    SnapshotLog.upsertScoped(spark, rootZ, bz, Seq("k"), "mon",
      statsCols = Seq("k"))
    graft.sources.Generated.add(spark, rootZ, "mon",
      "date_format(ts, 'yyyy-MM')")
    val verZ = SnapshotLog.currentVersion(spark, rootZ).get
    val (keptZ, totalZ) = SnapshotLog.candidateFilesEquals(spark, rootZ,
      verZ, "ts", java.sql.Timestamp.valueOf("2026-01-05 10:00:00"))
    assert(keptZ.size == totalZ,
      "zone-sensitive derivation must not prune (reader zones differ)")
    assert(SnapshotLog.readEquals(spark, rootZ, "ts",
      java.sql.Timestamp.valueOf("2026-01-05 10:00:00")).count() == 1)
  }

  test("spec evolution × clone: mixed sources refuse to clone, clones refuse to evolve (round 13)") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-06-01")
    val d2 = java.sql.Date.valueOf("2026-06-02")
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "a"), (2, "eu", d2, "b")).toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    // mixed layout: cloning would strand old-spec leafs without their
    // history — loud refusal
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.shallowClone(spark, root, freshRoot())
    }
    assert(e1.getMessage.contains("spec-evolved"), e1.getMessage)
    // converge (touch both days), then the clone lands cleanly
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "A"), (2, "eu", d2, "B")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    val dst = freshRoot()
    SnapshotLog.shallowClone(spark, root, dst)
    assert(SnapshotLog.read(spark, dst).count() == 2)
    // ...and the clone itself refuses to evolve until materialized
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.repartitionSpec(spark, dst, "days(d)")
    }
    assert(e2.getMessage.contains("clone-shaped"), e2.getMessage)
  }

  test("the streaming tail passes a respec commit as a metadata-only no-op (round 13)") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", "a")).toDF("k", "region", "v"), Seq("k"), "region")
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("respec_tail_sink").start()
    try {
      q.processAllAvailable()
      // mid-flight evolution: identical dirs and vectors, no rows —
      // the tail must pass it silently rather than die on the unknown
      // commit kind (scoped DML afterwards keeps its usual restart
      // contract — that refusal is not under test here)
      SnapshotLog.repartitionSpec(spark, root, "region,bucket(4, k)")
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
      assert(spark.table("respec_tail_sink").count() == 1,
        "tail must continue through the respec commit")
    } finally q.stop()
  }

  test("spec evolution composes: keyless overwrite, OCC refusal, row tracking (round 13)") {
    val root = freshRoot()
    val d1 = java.sql.Date.valueOf("2026-02-01")
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "a"), (2, "eu", d1, "b")).toDF("k", "region", "d", "v"),
      Seq("k"), "days(d)", statsCols = Seq("k"))
    SnapshotLog.enableRowTracking(spark, root)
    def ids(): Map[Int, Long] = SnapshotLog.readWithRowIds(spark, root)
      .select("k", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = ids()
    SnapshotLog.repartitionSpec(spark, root, "region,days(d)")
    // identities survive the metadata commit AND the migrating merge
    assert(ids() == before)
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", d1, "A")).toDF("k", "region", "d", "v"),
      Seq("k"), "region,days(d)", statsCols = Seq("k"))
    val after = ids()
    assert(after == before,
      s"migrating merge moved identities: $before -> $after")
    // keyless dynamic overwrite of ONE new-spec partition: the other
    // old-leaf row migrates, nothing is lost
    SnapshotLog.overwritePartitions(spark, root,
      Seq((7, "us", d1, "w")).toDF("k", "region", "d", "v"),
      "region,days(d)")
    val rows = SnapshotLog.read(spark, root).select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((7, "w"), (2, "b")), rows.toString)
    // the OCC stage refuses while old-spec leafs remain... after the
    // overwrite everything is new-spec, so it stages cleanly again
    val staged = SnapshotLog.stageScopedOcc(spark, root,
      Seq((8, "eu", d1, "x")).toDF("k", "region", "d", "v"), Seq("k"),
      "region,days(d)")
    SnapshotLog.publishScopedOcc(spark, root, staged)
    assert(SnapshotLog.read(spark, root).count() == 3)
  }
}
