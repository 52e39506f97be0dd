package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.sources.SnapshotLog

/** readPruned: the stats sidecar wired into a Catalyst FileIndex, so
  * ordinary DataFrame filters prune FILES automatically. Every test
  * asserts BOTH halves of the contract: fewer files actually scanned
  * (the numFiles metric after execution) and row parity with the
  * unpruned readVersion under the same predicate.
  */
class ReadPrunedSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_pruned").toString + "/t"

  /** ONE execution returning (rows, files actually read): the numFiles
    * driver metric is only posted on the execution that computes
    * selectedPartitions, so the frame must be collected exactly once.
    */
  private def scanned(df: DataFrame): (Set[Seq[Any]], Long) = {
    val rows = df.collect().map(_.toSeq).toSet
    val scans = df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    (rows, scans.map(_.metrics("numFiles").value).sum)
  }

  /** Four single-file commits with disjoint k ranges → 4-dir chain. */
  private def chain(): String = {
    val root = freshRoot()
    (0 until 4).foreach { i =>
      val batch = ((i * 100) until (i * 100 + 100))
        .map(k => (k, s"w${"%03d".format(k)}")).toDF("k", "w").coalesce(1)
      SnapshotLog.appendCommit(spark, root, batch, statsCols = Seq("k", "w"))
    }
    root
  }

  test("range, equality, IN, and OR filters prune files; rows match the unpruned read") {
    val root = chain()
    def parity(pred: DataFrame => DataFrame, wantFiles: Long): Unit = {
      val (rows, nFiles) = scanned(pred(SnapshotLog.readPruned(spark, root)))
      val full = pred(SnapshotLog.read(spark, root)).collect().map(_.toSeq).toSet
      assert(rows == full)
      assert(nFiles == wantFiles, s"expected $wantFiles files, got $nFiles")
    }
    parity(_.filter(col("k").between(110, 120)), 1)       // one dir's span
    parity(_.filter(col("k") >= 250), 2)                  // tail dirs
    parity(_.filter(col("k") < 100), 1)                   // head dir
    parity(_.filter(col("k") === 305), 1)                 // point probe
    parity(_.filter(col("k").isin(5, 205)), 2)            // IN across two dirs
    parity(_.filter(col("k") < 50 || col("k") > 350), 2)  // OR of ranges
    parity(_.filter(col("w") === "w150"), 1)              // string column stats
    parity(_.filter(col("k") > 9000), 0)                  // provably empty
    // a filter the index can't prove anything about keeps every file
    parity(_.filter(col("k") % 2 === 0), 4)
    // literal-first operand order proves the same spans
    parity(_.filter(lit(100) > col("k")), 1)
  }

  test("null-count stats prune IS NULL / IS NOT NULL; equality prunes all-null files") {
    // four single-file commits with distinct null profiles on `v`:
    // dir 1 no nulls, dir 2 mixed, dir 3 ALL null, dir 4 no nulls
    val root = freshRoot()
    def batch(i: Int, mk: Int => java.lang.Integer): DataFrame =
      ((i * 10) until (i * 10 + 10)).map(k => (k, mk(k))).toDF("k", "v").coalesce(1)
    SnapshotLog.appendCommit(spark, root, batch(0, k => k), statsCols = Seq("k", "v"))
    SnapshotLog.appendCommit(spark, root,
      batch(1, k => if (k % 2 == 0) null else k), statsCols = Seq("k", "v"))
    SnapshotLog.appendCommit(spark, root, batch(2, _ => null), statsCols = Seq("k", "v"))
    SnapshotLog.appendCommit(spark, root, batch(3, k => k), statsCols = Seq("k", "v"))
    def parity(pred: DataFrame => DataFrame, wantFiles: Long): Unit = {
      val (rows, nFiles) = scanned(pred(SnapshotLog.readPruned(spark, root)))
      val full = pred(SnapshotLog.read(spark, root)).collect().map(_.toSeq).toSet
      assert(rows == full)
      assert(nFiles == wantFiles, s"expected $wantFiles files, got $nFiles")
    }
    // IS NULL keeps only the dirs that HAVE nulls (mixed + all-null)
    parity(_.filter(col("v").isNull), 2)
    // IS NOT NULL drops the all-null dir
    parity(_.filter(col("v").isNotNull), 3)
    // equality on an all-null file prunes it: v = 25 can only live in
    // dir 2's k-span, but dir 2 is all-null — provably empty
    parity(_.filter(col("v") === 25), 0)
    // ... and the implicit IsNotNull Catalyst adds to any v-filter
    // composes: a v-range over dirs {0,1} never touches dirs {2,3}
    parity(_.filter(col("v") < 15), 2)
    // the distributed checkpoint path makes the same decisions
    val key = "graft.stats.checkpointThresholdBytes"
    spark.conf.set(key, "0")
    try {
      SnapshotLog.appendCommit(spark, root, batch(4, k => k), statsCols = Seq("k", "v"))
      parity(_.filter(col("v").isNull), 2)
      parity(_.filter(col("v").isNotNull), 4)
      parity(_.filter(col("v") === 25), 0)
    } finally spark.conf.unset(key)
  }

  test("unsupported predicates and no-stats columns stay correct (no pruning, right rows)") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root,
      Seq((3, "c")).toDF("k", "v").coalesce(1), statsCols = Seq("k"))
    val (rows, nFiles) = scanned(
      SnapshotLog.readPruned(spark, root).filter(col("v") >= "b"))
    assert(rows.map(_.head) == Set(2, 3))
    assert(nFiles == 2, "v has no stats: both files kept")
  }

  test("deletion vectors and evolved schemas compose with the pruned scan") {
    import org.apache.spark.sql.functions.lit
    val root = chain()
    SnapshotLog.tombstoneDelete(spark, root, Seq(115).toDF("k"), Seq("k"))
    val pruned = SnapshotLog.readPruned(spark, root).filter(col("k").between(110, 120))
    assert(pruned.select("k").as[Int].collect().toSet ==
      (110 to 120).toSet - 115, "tombstone must apply to the pruned scan")
    // widen, then filter on the NEW column: pre-evolution files have no
    // spans for it → kept and null-filled, never wrongly pruned
    SnapshotLog.appendEvolved(spark, root,
      Seq((999, "z", 7)).toDF("k", "w", "score"), statsCols = Seq("k", "score"))
    val wide = SnapshotLog.readPruned(spark, root)
    assert(wide.filter(col("score") === 7).select("k").as[Int].collect().toSeq == Seq(999))
    assert(wide.filter(col("score").isNull).count() == 399)
  }

  test("scoped tables get dir-name partition pruning through ordinary filters") {
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "a", "p1"), (2, "b", "p2"), (3, "c", "p2")).toDF("k", "v", "p"),
      Seq("k"), partitionCol = "p")
    val (rows, nPruned) = scanned(
      SnapshotLog.readPruned(spark, root).filter(col("p") === "p2").select("k"))
    assert(rows.map(_.head) == Set(2, 3))
    val (_, all) = scanned(SnapshotLog.readPruned(spark, root))
    assert(nPruned < all,
      s"partition filter must scan fewer than all $all files, got $nPruned")
  }

  test("OPTIMIZE ZORDER + readPruned: a conjunctive filter prunes on both columns at once") {
    val root = freshRoot()
    val df = spark.range(10000).toDF("id")
      .withColumn("x", expr("id % 100"))
      .withColumn("y", expr("id div 100"))
      .repartition(16) // scatter: nothing prunes before the re-cluster
    SnapshotLog.commit(spark, root, df, statsCols = Seq("x", "y"))
    SnapshotLog.compactChain(spark, root, nFiles = 16,
      statsCols = Seq("x", "y"), zorderBy = Seq("x", "y"))
    val (rows, nFiles) = scanned(SnapshotLog.readPruned(spark, root)
      .filter(col("x").between(10, 15) && col("y").between(80, 85)))
    assert(rows.size == 36, s"6x6 grid cells, got ${rows.size}")
    assert(nFiles < 16 / 2,
      s"Morton clustering must let BOTH spans bite through plain filters: $nFiles of 16")
  }

  test("distributed span evaluation (threshold 0) keeps exact parity with the driver path") {
    // the 10⁶-file path: above the size threshold the sidecar is
    // evaluated as a Spark job and the driver collects only PRUNED file
    // keys. Forcing the threshold to 0 routes every probe through it;
    // kept-file sets and rows must be identical to the driver-side
    // default on numeric, string and no-stats probes.
    val root = chain()
    def keptNames(): Map[String, (Int, Long)] = {
      val probes = Seq(
        ("k range", () => scanned(
          SnapshotLog.readPruned(spark, root).filter(col("k").between(110, 120)))),
        ("w string", () => scanned(
          SnapshotLog.readPruned(spark, root).filter(col("w") === "w305"))),
        ("k point", () => scanned(
          SnapshotLog.readPruned(spark, root).filter(col("k") === 7))))
      probes.map { case (n, f) => val (rows, files) = f(); n -> (rows.size, files) }.toMap
    }
    val driver = keptNames()
    spark.conf.set("graft.skipping.distributedThresholdBytes", "0")
    try {
      val dist = keptNames()
      assert(dist == driver, s"distributed != driver: $dist vs $driver")
      // and the distributed path still actually prunes (not keep-all)
      assert(dist("k range")._2 < 4, s"no pruning in distributed path: $dist")
    } finally spark.conf.unset("graft.skipping.distributedThresholdBytes")
  }

  test("checkpoint-regime planning ships the smaller verdict side, never driver spans (round 14)") {
    // the 10⁶-file planning bound: with a parquet stats checkpoint, the
    // span rows are evaluated by a distributed job and the driver
    // receives only the SMALLER verdict side — a selective probe ships
    // the kept keys (O(result)); a broad one ships the (tiny) pruned
    // set. In-memory span maps must never be built in this regime.
    val key = "graft.stats.checkpointThresholdBytes"
    spark.conf.set(key, "0") // checkpoint storage from the first commit
    val root = try {
      val r = freshRoot()
      (0 until 4).foreach { i =>
        val batch = ((i * 100) until (i * 100 + 100))
          .map(k => (k, s"w${"%03d".format(k)}")).toDF("k", "w").coalesce(1)
        SnapshotLog.appendCommit(spark, r, batch, statsCols = Seq("k", "w"))
      }
      r
    } finally spark.conf.unset(key)
    // selective point probe: one file admits → the KEPT side ships
    SnapshotLog.lastPlanPrune = ""
    val (rows, files) = scanned(
      SnapshotLog.readPruned(spark, root).filter(col("k") === 7))
    assert(files == 1, s"expected 1 file scanned, got $files")
    assert(rows == Set(Seq(7, "w007")))
    assert(SnapshotLog.lastPlanPrune.startsWith("pq-kept:"),
      s"selective probe must ship kept keys, got '${SnapshotLog.lastPlanPrune}'")
    assert(SnapshotLog.lastPlanPrune.split(":")(1).toInt == 1,
      "kept side must be O(result), not O(files)")
    // broad probe: everything admits → the PRUNED side (empty) ships
    SnapshotLog.lastPlanPrune = ""
    val (rowsAll, filesAll) = scanned(
      SnapshotLog.readPruned(spark, root).filter(col("k") >= 0))
    assert(filesAll == 4 && rowsAll.size == 400)
    assert(SnapshotLog.lastPlanPrune == "pq-pruned:0",
      s"broad probe must ship the empty pruned set, got '${SnapshotLog.lastPlanPrune}'")
  }

  test("planning-state cache: repeat reads of a version recompute nothing (round 14)") {
    val root = chain()
    def misses = SnapshotLog.planInputsMisses
    def rows(pred: org.apache.spark.sql.Column) =
      SnapshotLog.readPruned(spark, root).filter(pred).collect()
        .map(_.toSeq).toSet
    val m0 = misses
    val first = rows(col("k") === 7)
    assert(misses > m0, "first read must compute the planning inputs")
    val m1 = misses
    // repeated reads — same version, ANY predicate — replan from cache
    assert(rows(col("k") === 7) == first)
    assert(rows(col("k").between(110, 120)).nonEmpty)
    assert(misses == m1, "repeat reads recomputed the planning inputs")
    // a new commit is a new version → one fresh compute, correct rows
    SnapshotLog.appendCommit(spark, root,
      Seq((999, "w999")).toDF("k", "w").coalesce(1),
      statsCols = Seq("k", "w"))
    assert(rows(col("k") === 999) == Set(Seq(999, "w999")))
    assert(misses == m1 + 1, "new version must compute exactly once")
    // DROP + re-create at the same path restarts version numbers: the
    // manifest-identity key must refuse the old table's cached listing.
    // The recreated table is committed up to the SAME version number
    // the reads above cached (head = 5) — with a bare (root, version)
    // key this read would hit the dropped table's entry and fail
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    (1 to 5).foreach { i =>
      val b = Seq((i, s"fresh$i")).toDF("k", "w").coalesce(1)
      if (i == 1) SnapshotLog.commit(spark, root, b, statsCols = Seq("k", "w"))
      else SnapshotLog.appendCommit(spark, root, b, statsCols = Seq("k", "w"))
    }
    assert(SnapshotLog.currentVersion(spark, root).contains(5L),
      "fixture must land on the previously cached version number")
    assert(rows(col("k") === 1) == Set(Seq(1, "fresh1")),
      "cache served the dropped table's listing")
    // disabled → every read recomputes
    spark.conf.set("spark.graft.plan.cache", "false")
    try {
      val m2 = misses
      rows(col("k") === 1); rows(col("k") === 1)
      assert(misses == m2, "uncached path must not touch the counter")
    } finally spark.conf.unset("spark.graft.plan.cache")
  }

  test("plan cache evicts by BYTES, not entries; over-budget entries are never admitted (round 15)") {
    val rootA = chain()
    val rootB = chain()
    def misses = SnapshotLog.planInputsMisses
    def read(r: String) =
      SnapshotLog.readPruned(spark, r).filter(col("k") === 7).collect()
    // measure one table's entry weight from a clean cache
    SnapshotLog.planCacheClear()
    read(rootA)
    val wA = SnapshotLog.planCacheBytes
    assert(wA > 0L, "admitting an entry must account its weight")
    // budget fits ONE entry but not two: admitting B must evict A even
    // though the old 8-entry LRU had room for both
    spark.conf.set("spark.graft.plan.cacheBudgetBytes", (wA * 3 / 2).toString)
    try {
      val m0 = misses
      read(rootA)
      assert(misses == m0, "within-budget entry must still serve hits")
      read(rootB) // admit B → A (eldest) evicted by bytes
      assert(SnapshotLog.planCacheBytes <= wA * 3 / 2,
        s"cache bytes ${SnapshotLog.planCacheBytes} exceed the budget")
      val m1 = misses
      read(rootB)
      assert(misses == m1, "the surviving entry must hit")
      read(rootA)
      assert(misses == m1 + 1, "the byte-evicted entry must recompute")
      // an entry larger than the WHOLE budget is served but never
      // admitted (admitting it would evict everything and still not fit)
      SnapshotLog.planCacheClear()
      spark.conf.set("spark.graft.plan.cacheBudgetBytes", "10")
      val m2 = misses
      read(rootA); read(rootA)
      assert(misses == m2 + 2, "an over-budget entry must not be admitted")
      assert(SnapshotLog.planCacheBytes == 0L,
        "a refused entry must account no weight")
    } finally spark.conf.unset("spark.graft.plan.cacheBudgetBytes")
  }

  test("property: arbitrary ranges keep parity with the unpruned read") {
    val root = chain()
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val lo = rnd.nextInt(500) - 50
      val hi = lo + rnd.nextInt(200)
      val p = SnapshotLog.readPruned(spark, root)
        .filter(col("k").between(lo, hi)).select("k").as[Int].collect().toSet
      val f = SnapshotLog.read(spark, root)
        .filter(col("k").between(lo, hi)).select("k").as[Int].collect().toSet
      assert(p == f, s"range [$lo,$hi]")
    }
  }
}
