package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotLog

/** The round-7 verdict's top ask: the snapshot-log lifecycle driven
  * PURELY through `spark.sql(...)` — catalog DDL, INSERT/UPDATE/DELETE/
  * MERGE, time travel, and the maintenance verbs as `CALL` procedures.
  * This spec re-runs the TableLifecycleSpec story through SQL and
  * additionally asserts the LOWERING is the scale-correct one:
  * DELETE produces a deletion-vector version (no data rewrite), and a
  * classic upsert-shaped MERGE on a PARTITIONED BY table lands as a
  * scoped (per-partition leaf) commit, not a full rewrite.
  *
  * The suite owns its SparkSession (extensions must be injected at
  * build time), stopping any shared one first and stopping its own in
  * afterAll — the SparkSpecBase getOrCreate contract rebuilds a clean
  * session for later suites (HarnessRehearsalSpec precedent).
  */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: String = _
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft_sql_wh").toString
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-surface")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  private def sql(q: String) = spark.sql(q)
  private def rowsOf(q: String): Set[Seq[Any]] =
    sql(q).collect().toSet[Row].map(_.toSeq)
  private def root(name: String) = s"$warehouse/ns/$name"

  test("lifecycle purely through spark.sql: DDL → DML → time travel → maintenance") {
    sql("CREATE NAMESPACE graft.ns")
    sql("CREATE TABLE graft.ns.t (k INT, v STRING)")

    // --- ingest via SQL (each INSERT is one O(batch) append commit)
    sql("INSERT INTO graft.ns.t VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.ns.t VALUES (3, 'c')")
    assert(rowsOf("SELECT k, v FROM graft.ns.t") ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    // spark.read.table resolves through the same catalog
    assert(spark.read.table("graft.ns.t").count() == 3)

    // --- time travel: version 2 predates the second insert
    assert(rowsOf("SELECT k FROM graft.ns.t VERSION AS OF 2") ==
      Set(Seq(1), Seq(2)))

    // --- additive evolution: ALTER pins the widened schema; older rows
    //     read NULL for the new column, no files rewritten
    sql("ALTER TABLE graft.ns.t ADD COLUMNS (score INT)")
    sql("INSERT INTO graft.ns.t VALUES (4, 'd', 9)")
    assert(rowsOf("SELECT k, score FROM graft.ns.t WHERE k IN (1, 4)") ==
      Set(Seq(1, null), Seq(4, 9)))

    // --- UPDATE on a flat table lowers MERGE-ON-READ: one version whose
    //     deletion vector hides the old copies and whose appended dir
    //     carries the rewrites — pre-existing data dirs untouched
    val beforeUpd = SnapshotLog.currentVersion(spark, root("t")).get
    sql("UPDATE graft.ns.t SET v = 'z' WHERE k = 1")
    val afterUpd = SnapshotLog.currentVersion(spark, root("t")).get
    assert(afterUpd == beforeUpd + 1)
    assert(rowsOf("SELECT v FROM graft.ns.t WHERE k = 1") == Set(Seq("z")))
    assert(SnapshotLog.tombDirsOf(spark, root("t"), afterUpd).nonEmpty,
      "SQL UPDATE must ride the deletion-vector path, not a rewrite")
    assert(SnapshotLog.dirsOf(spark, root("t"), beforeUpd).forall(
      SnapshotLog.dirsOf(spark, root("t"), afterUpd).contains),
      "UPDATE must carry all pre-existing data directories by reference")
    // SET expressions over the current row re-bind too
    sql("UPDATE graft.ns.t SET score = score + 1 WHERE k = 4")
    assert(rowsOf("SELECT score FROM graft.ns.t WHERE k = 4") == Set(Seq(10)))
    sql("UPDATE graft.ns.t SET score = score - 1 WHERE k = 4")
    assert(rowsOf("SELECT score FROM graft.ns.t WHERE k = 4") == Set(Seq(9)))

    // --- DELETE lowers to deletion vectors: the new head carries a
    //     tombstone dir and the prior version's data dirs verbatim
    val beforeDel = SnapshotLog.currentVersion(spark, root("t")).get
    sql("DELETE FROM graft.ns.t WHERE k = 2")
    val afterDel = SnapshotLog.currentVersion(spark, root("t")).get
    assert(afterDel == beforeDel + 1)
    assert(SnapshotLog.tombDirsOf(spark, root("t"), afterDel).nonEmpty,
      "SQL DELETE must ride the deletion-vector path, not a rewrite")
    assert(SnapshotLog.dirsOf(spark, root("t"), afterDel) ==
      SnapshotLog.dirsOf(spark, root("t"), beforeDel),
      "DELETE must not touch data directories")
    assert(rowsOf("SELECT k FROM graft.ns.t") == Set(Seq(1), Seq(3), Seq(4)))

    // --- general MERGE: delete / update / insert clauses in one pass
    val s0 = spark; import s0.implicits._
    Seq((1, "one", 10), (3, "DEL", 0), (9, "nine", 99))
      .toDF("k", "v", "score").createOrReplaceTempView("src")
    sql("""MERGE INTO graft.ns.t t USING src s ON t.k = s.k
           WHEN MATCHED AND s.v = 'DEL' THEN DELETE
           WHEN MATCHED THEN UPDATE SET v = s.v, score = s.score
           WHEN NOT MATCHED THEN INSERT (k, v, score) VALUES (s.k, s.v, s.score)""")
    assert(rowsOf("SELECT k, v, score FROM graft.ns.t") ==
      Set(Seq(1, "one", 10), Seq(4, "d", 9), Seq(9, "nine", 99)))

    // --- maintenance as DSv2 procedures
    val hist = sql("CALL graft.system.history('ns.t')").collect()
    assert(hist.map(_.getLong(0)).toSeq == hist.map(_.getLong(0)).toSeq.sorted.reverse
      && hist.nonEmpty)

    // a bad commit lands ... and is rolled back at metadata cost
    val good = SnapshotLog.currentVersion(spark, root("t")).get
    sql("INSERT INTO graft.ns.t VALUES (99, 'junk', -1)")
    assert(rowsOf("SELECT count(*) FROM graft.ns.t WHERE k = 99") == Set(Seq(1L)))
    val restored = sql(s"CALL graft.system.restore('ns.t', $good)").collect()
    assert(restored.head.getLong(0) == good + 2)
    assert(rowsOf("SELECT count(*) FROM graft.ns.t WHERE k = 99") == Set(Seq(0L)))

    // TIMESTAMP AS OF the restored head's commit time = current state
    val ts = sql("CALL graft.system.history('ns.t')").collect()
      .head.getTimestamp(1)
    assert(rowsOf(s"SELECT k FROM graft.ns.t TIMESTAMP AS OF '$ts'") ==
      rowsOf("SELECT k FROM graft.ns.t"))

    // compact + vacuum keep the state; history shrinks to the horizon
    sql("CALL graft.system.compact_small_files('ns.t', 1073741824)")
    sql("CALL graft.system.vacuum('ns.t', 1)")
    assert(rowsOf("SELECT k, v, score FROM graft.ns.t") ==
      Set(Seq(1, "one", 10), Seq(4, "d", 9), Seq(9, "nine", 99)))

    // --- catalog metadata surface
    assert(sql("SHOW TABLES IN graft.ns").collect()
      .map(_.getString(1)).contains("t"))
    val desc = sql("DESCRIBE TABLE graft.ns.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("k").contains("int") && desc.get("score").contains("int"))
  }

  test("CTAS, INSERT OVERWRITE, and reads composing with plain SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.base (id INT, grp STRING)")
    sql("INSERT INTO graft.ns.base VALUES (1,'x'), (2,'x'), (3,'y')")

    sql("CREATE TABLE graft.ns.agg AS " +
      "SELECT grp, count(*) AS n FROM graft.ns.base GROUP BY grp")
    assert(rowsOf("SELECT grp, n FROM graft.ns.agg") ==
      Set(Seq("x", 2L), Seq("y", 1L)))

    // graft tables join with graft tables through ordinary SQL
    assert(rowsOf(
      """SELECT b.id FROM graft.ns.base b
         JOIN graft.ns.agg a ON b.grp = a.grp WHERE a.n = 2""") ==
      Set(Seq(1), Seq(2)))

    // scalar subquery over a graft table
    assert(rowsOf(
      "SELECT id FROM graft.ns.base WHERE id > (SELECT min(n) FROM graft.ns.agg)") ==
      Set(Seq(2), Seq(3)))

    sql("INSERT OVERWRITE graft.ns.agg SELECT grp, 0 AS n FROM graft.ns.base GROUP BY grp")
    assert(rowsOf("SELECT grp, n FROM graft.ns.agg") ==
      Set(Seq("x", 0L), Seq("y", 0L)))
  }

  test("CALL optimize_zorder compacts, re-clusters, and the result prunes files") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.z (a INT, b INT)")
    // round-robin-ish inserts: each commit spans the whole a/b range, so
    // pre-optimize stats cannot prune a point probe
    (0 until 4).foreach { i =>
      val s0 = spark; import s0.implicits._
      (i until 400 by 4).map(j => (j % 20, j / 20)).toDF("a", "b")
        .createOrReplaceTempView(s"zb$i")
      sql(s"INSERT INTO graft.ns.z SELECT * FROM zb$i")
    }
    val before = rowsOf("SELECT a, b FROM graft.ns.z")
    val v = sql("CALL graft.system.optimize_zorder('ns.z', 4, 'a,b')")
      .head().getLong(0)
    assert(v > 4)
    assert(rowsOf("SELECT a, b FROM graft.ns.z") == before,
      "OPTIMIZE must not change table contents")
    // the re-clustered layout skips files on a conjunctive range probe
    val (ka, totalA) = SnapshotLog.candidateFiles(spark, root("z"), v, "a", 0, 4)
    val (kb, _) = SnapshotLog.candidateFiles(spark, root("z"), v, "b", 0, 4)
    val kept = ka.map(_.toString).toSet intersect kb.map(_.toString).toSet
    assert(totalA == 4 && kept.size < totalA,
      s"z-order layout did not prune: ${kept.size} of $totalA")
  }

  test("CALL optimize_zorder on a PARTITIONED table routes per-leaf: leaf layout survives") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.zp (k INT, region STRING, a INT, b INT) PARTITIONED BY (region)")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "40")
    try (0 until 4).foreach { i =>
      val s0 = spark; import s0.implicits._
      (i until 400 by 4).map(j =>
        (j, if (j % 2 == 0) "us" else "eu", (j * 37) % 400, (j * 91) % 400))
        .toDF("k", "region", "a", "b").createOrReplaceTempView(s"zpb$i")
      // partition identity rides the keys (region in the ON), so the
      // MERGE routes through the scoped upsert and leafs materialize
      sql(s"""MERGE INTO graft.ns.zp t USING zpb$i s
              ON t.k = s.k AND t.region = s.region
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
    } finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    val before = rowsOf("SELECT k, a FROM graft.ns.zp")
    val r = root("zp")
    val v = sql("CALL graft.system.optimize_zorder('ns.zp', 4, 'a,b')")
      .head().getLong(0)
    // the scoped route: leaf dirs survive (compactChain would flatten)
    val leafs = SnapshotLog.dirsOf(spark, r, v)
      .map(d => d.substring(d.lastIndexOf('/') + 1)).toSet
    assert(leafs == Set("__gp=us", "__gp=eu"), leafs.toString)
    assert(rowsOf("SELECT k, a FROM graft.ns.zp") == before)
    // a narrow conjunctive probe prunes within the leafs
    val (ka, totalA) = SnapshotLog.candidateFiles(spark, r, v, "a", 0, 30)
    assert(totalA >= 4 && ka.size < totalA,
      s"scoped z-order did not prune: ${ka.size} of $totalA")
  }

  test("CALL txn_recover converges a crashed cross-table transaction participant") {
    sql("CREATE TABLE graft.ns.txa (k INT, v STRING)")
    sql("CREATE TABLE graft.ns.txb (k INT, v STRING)")
    sql("INSERT INTO graft.ns.txa VALUES (1, 'a')")
    sql("INSERT INTO graft.ns.txb VALUES (10, 'x')")
    val ss = spark; import ss.implicits._ // stable path for toDF
    // crash AFTER the intent rename (the commit point): neither LATEST
    // has flipped, but the transaction is committed — recovery must
    // roll both forward
    graft.sources.Txn.crashAfter = "intent"
    try intercept[IllegalStateException] {
      graft.sources.Txn.commitAppendAll(spark, Seq(
        graft.sources.Txn.TableAppend(root("txa"),
          Seq((2, "b")).toDF("k", "v").coalesce(1)),
        graft.sources.Txn.TableAppend(root("txb"),
          Seq((11, "y")).toDF("k", "v").coalesce(1))))
    } finally graft.sources.Txn.crashAfter = ""
    assert(rowsOf("SELECT k FROM graft.ns.txa") == Set(Seq(1)))
    val va = sql("CALL graft.system.txn_recover('ns.txa')").head().getLong(0)
    val vb = sql("CALL graft.system.txn_recover('ns.txb')").head().getLong(0)
    assert(va >= 2L && vb >= 2L, s"recovered versions: $va, $vb")
    assert(rowsOf("SELECT k FROM graft.ns.txa") == Set(Seq(1), Seq(2)))
    assert(rowsOf("SELECT k FROM graft.ns.txb") == Set(Seq(10), Seq(11)))
  }

  test("CALL txn_append commits several tables atomically from SQL (r16)") {
    sql("CREATE TABLE graft.ns.txf (k INT, v STRING)")
    sql("CREATE TABLE graft.ns.txd (k INT, v STRING)")
    sql("INSERT INTO graft.ns.txf VALUES (1, 'a')")
    sql("CREATE OR REPLACE TEMP VIEW txf_batch AS SELECT 2 AS k, 'b' AS v")
    sql("CREATE OR REPLACE TEMP VIEW txd_batch AS " +
      "SELECT * FROM VALUES (10, 'x'), (11, 'y') AS t(k, v)")
    val out = sql(
      "CALL graft.system.txn_append('ns.txf,ns.txd', 'txf_batch,txd_batch')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // CREATE TABLE itself commits an empty v1, INSERT is v2 — the
    // transaction lands v3 on the fact and v2 on the fresh dim
    assert(out == Map("ns.txf" -> 3L, "ns.txd" -> 2L), s"got $out")
    assert(rowsOf("SELECT k FROM graft.ns.txf") == Set(Seq(1), Seq(2)))
    assert(rowsOf("SELECT k FROM graft.ns.txd") == Set(Seq(10), Seq(11)))
    // mismatched list lengths are refused loudly
    val e = intercept[Exception] {
      sql("CALL graft.system.txn_append('ns.txf', 'txf_batch,txd_batch')")
        .collect()
    }
    assert(e.getMessage.contains("pair up"), e.getMessage)
  }

  test("CALL clone creates a zero-copy table the catalog serves like any other") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.orig (k INT, v STRING)")
    sql("INSERT INTO graft.ns.orig VALUES (1, 'a'), (2, 'b')")
    val v = sql("CALL graft.system.clone('ns.orig', 'ns.copy')").head().getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, root("orig")).get,
      "clone publishes at the source's head version")
    assert(rowsOf("SELECT k, v FROM graft.ns.copy") ==
      Set(Seq(1, "a"), Seq(2, "b")))
    // the copy is a first-class catalog table: DML diverges it from the
    // original without touching it
    sql("UPDATE graft.ns.copy SET v = 'z' WHERE k = 1")
    assert(rowsOf("SELECT v FROM graft.ns.copy WHERE k = 1") == Set(Seq("z")))
    assert(rowsOf("SELECT v FROM graft.ns.orig WHERE k = 1") == Set(Seq("a")))
    assert(sql("SHOW TABLES IN graft.ns").collect()
      .map(_.getString(1)).contains("copy"))
  }

  test("vector kernels resolve as plain SQL functions in an extensions session") {
    val r = sql(
      """SELECT vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |               CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
        |       vec_norm_sq(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n"""
        .stripMargin).head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 25.0) < 1e-9)
  }

  test("readStream.table tails a catalog table by name (MICRO_BATCH_READ capability)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.st (k INT, v STRING)")
    sql("INSERT INTO graft.ns.st VALUES (1, 'a')")
    val ck = java.nio.file.Files.createTempDirectory("graft_sql_tail_ck").toString
    val q = spark.readStream.table("graft.ns.st")
      .writeStream.format("memory").queryName("sql_tail")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(rowsOf("SELECT * FROM sql_tail") == Set(Seq(1, "a")))
      // a SQL INSERT (O(batch) append commit) flows through the tail
      sql("INSERT INTO graft.ns.st VALUES (2, 'b')")
      q.processAllAvailable()
      assert(rowsOf("SELECT * FROM sql_tail") == Set(Seq(1, "a"), Seq(2, "b")))
    } finally q.stop()
    // batch reads still resolve through the analyzer expansion, not a
    // connector scan — same results, pushdown intact
    assert(rowsOf("SELECT k, v FROM graft.ns.st") == Set(Seq(1, "a"), Seq(2, "b")))
  }

  test("classic upsert MERGE on a PARTITIONED BY table lowers to a scoped commit") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.pt (k INT, p STRING, x INT) PARTITIONED BY (p)")
    val s0 = spark; import s0.implicits._
    Seq((1, "a", 10), (2, "a", 20), (3, "b", 30))
      .toDF("k", "p", "x").createOrReplaceTempView("s1")
    sql("""MERGE INTO graft.ns.pt t USING s1 s ON t.k = s.k AND t.p = s.p
           WHEN MATCHED THEN UPDATE SET k = s.k, p = s.p, x = s.x
           WHEN NOT MATCHED THEN INSERT (k, p, x) VALUES (s.k, s.p, s.x)""")
    assert(rowsOf("SELECT k, p, x FROM graft.ns.pt") ==
      Set(Seq(1, "a", 10), Seq(2, "a", 20), Seq(3, "b", 30)))

    // second batch touches only partition 'a' — the commit must be
    // scoped: partition-leaf dirs in the manifest, with partition 'b'
    // carried forward UNTOUCHED from the previous version
    val before = SnapshotLog.currentVersion(spark, root("pt")).get
    Seq((2, "a", 21), (4, "a", 40)).toDF("k", "p", "x")
      .createOrReplaceTempView("s2")
    sql("""MERGE INTO graft.ns.pt t USING s2 s ON t.k = s.k AND t.p = s.p
           WHEN MATCHED THEN UPDATE SET k = s.k, p = s.p, x = s.x
           WHEN NOT MATCHED THEN INSERT (k, p, x) VALUES (s.k, s.p, s.x)""")
    val after = SnapshotLog.currentVersion(spark, root("pt")).get
    val dirsBefore = SnapshotLog.dirsOf(spark, root("pt"), before)
    val dirsAfter = SnapshotLog.dirsOf(spark, root("pt"), after)
    assert(dirsAfter.forall(_.contains("__gp=")),
      s"scoped manifest expected partition leaf dirs, got $dirsAfter")
    val carriedB = dirsBefore.filter(_.endsWith("__gp=a") == false)
      .filter(_.contains("__gp=b"))
    assert(carriedB.nonEmpty && carriedB.forall(dirsAfter.contains),
      s"untouched partition b must carry forward: before=$dirsBefore after=$dirsAfter")
    assert(rowsOf("SELECT k, p, x FROM graft.ns.pt") ==
      Set(Seq(1, "a", 10), Seq(2, "a", 21), Seq(3, "b", 30), Seq(4, "a", 40)))
  }

  test("MERGE on a two-column-partitioned table: composite leafs, untouched leafs byte-identical") {
    def fileState(dir: java.io.File): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dir).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.pt2 (k INT, r STRING, d DATE, x INT)
           PARTITIONED BY (r, d)""")
    val s0 = spark; import s0.implicits._
    def merge(view: String): Unit =
      sql(s"""MERGE INTO graft.ns.pt2 t USING $view s
              ON t.k = s.k AND t.r = s.r AND t.d = s.d
              WHEN MATCHED THEN UPDATE SET k = s.k, r = s.r, d = s.d, x = s.x
              WHEN NOT MATCHED THEN INSERT (k, r, d, x) VALUES (s.k, s.r, s.d, s.x)""")
    Seq((1, "a", "2024-01-01", 10), (2, "a", "2024-01-02", 20),
        (3, "b", "2024-01-01", 30))
      .toDF("k", "r", "ds", "x").withColumn("d", $"ds".cast("date")).drop("ds")
      .createOrReplaceTempView("m1")
    merge("m1")
    val before = SnapshotLog.currentVersion(spark, root("pt2")).get
    val dirsBefore = SnapshotLog.dirsOf(spark, root("pt2"), before)
    assert(dirsBefore.forall(_.contains("__gp=")),
      s"composite-partitioned MERGE must land scoped, got $dirsBefore")
    assert(dirsBefore.size == 3, s"one leaf per (r, d) pair: $dirsBefore")
    // second MERGE touches ONLY (a, 2024-01-02) — the other two leafs
    // must carry by reference, byte- and mtime-identical
    val untouched = dirsBefore.filterNot(_.contains("2024-01-02"))
    val untouchedState = untouched.map(dr =>
      dr -> fileState(new java.io.File(root("pt2"), dr))).toMap
    Seq((2, "a", "2024-01-02", 21), (9, "a", "2024-01-02", 90))
      .toDF("k", "r", "ds", "x").withColumn("d", $"ds".cast("date")).drop("ds")
      .createOrReplaceTempView("m2")
    merge("m2")
    val after = SnapshotLog.currentVersion(spark, root("pt2")).get
    assert(after == before + 1)
    val dirsAfter = SnapshotLog.dirsOf(spark, root("pt2"), after)
    untouched.foreach { dr =>
      assert(dirsAfter.contains(dr), s"untouched leaf $dr must carry: $dirsAfter")
      assert(fileState(new java.io.File(root("pt2"), dr)) == untouchedState(dr),
        s"untouched leaf $dr was rewritten")
    }
    assert(rowsOf("SELECT k, r, x FROM graft.ns.pt2") ==
      Set(Seq(1, "a", 10), Seq(2, "a", 21), Seq(3, "b", 30), Seq(9, "a", 90)))
    // dir-name pruning works per COMPONENT of the composite leaf value
    val (keptR, totR) = SnapshotLog.candidateFiles(spark, root("pt2"), after,
      "r", "b", "b")
    assert(totR >= 3 && keptR.size < totR,
      s"component pruning on r: kept ${keptR.size} of $totR")
    assert(rowsOf("SELECT k FROM graft.ns.pt2 WHERE r = 'b'") == Set(Seq(3)))
  }

  test("days() transform partitioning: day leafs, MERGE scopes, day pruning") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.ptd (k INT, d DATE, x INT)
           PARTITIONED BY (days(d))""")
    val s0 = spark; import s0.implicits._
    def merge(view: String): Unit =
      sql(s"""MERGE INTO graft.ns.ptd t USING $view s
              ON t.k = s.k AND t.d = s.d
              WHEN MATCHED THEN UPDATE SET k = s.k, d = s.d, x = s.x
              WHEN NOT MATCHED THEN INSERT (k, d, x) VALUES (s.k, s.d, s.x)""")
    Seq((1, "2024-03-01", 1), (2, "2024-03-02", 2), (3, "2024-03-03", 3))
      .toDF("k", "ds", "x").withColumn("d", $"ds".cast("date")).drop("ds")
      .createOrReplaceTempView("d1")
    merge("d1")
    val v = SnapshotLog.currentVersion(spark, root("ptd")).get
    val dirs = SnapshotLog.dirsOf(spark, root("ptd"), v)
    assert(dirs.size == 3 && dirs.forall(_.contains("__gp=2024-03-")),
      s"expected one day leaf per date, got $dirs")
    // a range probe on the RAW date column prunes through the day dirs
    val (kept, tot) = SnapshotLog.candidateFiles(spark, root("ptd"), v,
      "d", java.sql.Date.valueOf("2024-03-02"), java.sql.Date.valueOf("2024-03-02"))
    assert(tot == 3 && kept.size == 1, s"day pruning: kept ${kept.size} of $tot")
    assert(rowsOf("SELECT k FROM graft.ns.ptd WHERE d = DATE'2024-03-02'") ==
      Set(Seq(2)))
  }

  test("CALL detail: one-row DESCRIBE DETAIL from the file manifest") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    // round 12: a stats-covered clean table reports its row count from
    // the sidecar (O(manifest), no scan)
    sql("""CREATE TABLE graft.ns.detrc (k INT, v STRING)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    sql("INSERT INTO graft.ns.detrc VALUES (1, 'a'), (2, 'b')")
    assert(sql("CALL graft.system.detail('ns.detrc')").collect()
      .head.getLong(14) == 2L)
    sql("CREATE TABLE graft.ns.det (k INT, v STRING)")
    sql("INSERT INTO graft.ns.det VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.ns.det VALUES (3, 'c')")
    sql("DELETE FROM graft.ns.det WHERE k = 1")
    val d = sql("CALL graft.system.detail('ns.det')").collect().head
    assert(d.getLong(0) == 4L, s"head version: $d")       // create+2 inserts+delete
    assert(d.getLong(1) >= 2L && d.getLong(2) > 0L,       // files, bytes
      s"file manifest facts: $d")
    assert(d.getInt(4) == 1, s"one deletion-vector dir: $d")
    assert(!d.getBoolean(6) && d.getInt(7) == 1, s"unmapped, reader 1: $d")
    // round-9 facts: a small table's sidecar is text, the head recorded
    // no change files, and nothing pins history yet
    assert(d.getString(9) == "text" && !d.getBoolean(10) && d.getInt(11) == 0,
      s"round-9 detail facts: $d")
    // round-10 facts: no per-file carries, no constraints yet
    assert(d.getInt(12) == 0 && d.getInt(13) == 0, s"round-10 facts: $d")
    // round-12 fact: the DV makes the exact row count scan-only → NULL
    assert(d.isNullAt(14), s"row_count must be NULL under DVs: $d")
    // round-12 facts: no tracking, no generated/identity declarations
    assert(!d.getBoolean(15) && d.getInt(16) == 0 && d.getInt(17) == 0,
      s"round-12 facts: $d")
    sql("CREATE TABLE graft.ns.det12 (k BIGINT, v STRING, v_uc STRING)")
    sql("INSERT INTO graft.ns.det12 VALUES (1, 'a', 'A')")
    SnapshotLog.enableRowTracking(spark, root("det12"))
    sql("CALL graft.system.add_generated('ns.det12', 'v_uc', 'upper(v)')")
    sql("CALL graft.system.add_identity('ns.det12', 'k', 1, 1)")
    val dRt = sql("CALL graft.system.detail('ns.det12')").collect().head
    assert(dRt.getBoolean(15) && dRt.getInt(16) == 1 && dRt.getInt(17) == 1,
      s"tracking + generated + identity must surface: $dRt")
    // a rename flips the mapping facts
    sql("ALTER TABLE graft.ns.det RENAME COLUMN v TO body")
    val d2 = sql("CALL graft.system.detail('ns.det')").collect().head
    assert(d2.getBoolean(6) && d2.getInt(7) == 2, s"mapped, reader 2: $d2")
    // a constraint shows up in the count
    sql("ALTER TABLE graft.ns.det ADD CONSTRAINT kp CHECK (k > 0)")
    val d3 = sql("CALL graft.system.detail('ns.det')").collect().head
    assert(d3.getInt(13) == 1, s"constraint count: $d3")
  }

  test("CALL register_consumer pins history against CALL vacuum; dry run shows the radius") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.pin (k INT, v STRING)")
    sql("INSERT INTO graft.ns.pin VALUES (1, 'a')")
    sql("INSERT INTO graft.ns.pin VALUES (2, 'b')")
    sql("INSERT INTO graft.ns.pin VALUES (3, 'c')")   // head = v4 (create + 3)
    assert(sql("CALL graft.system.register_consumer('ns.pin', 'etl', 2)")
      .collect().head.getLong(1) == 2L)
    assert(rowsOf("CALL graft.system.consumers('ns.pin')") ==
      Set(Seq("etl", 2L)))
    // dry run honors the pin: only v1 is reclaimable
    assert(rowsOf("CALL graft.system.vacuum_dry_run('ns.pin', 1)") ==
      Set(Seq(1L)))
    sql("CALL graft.system.vacuum('ns.pin', 1)")
    assert(SnapshotLog.versions(spark, root("pin")) == Seq(2L, 3L, 4L),
      "vacuum must keep the pinned range")
    sql("CALL graft.system.unregister_consumer('ns.pin', 'etl')")
    assert(rowsOf("CALL graft.system.consumers('ns.pin')").isEmpty)
    sql("CALL graft.system.vacuum('ns.pin', 1)")
    assert(SnapshotLog.versions(spark, root("pin")) == Seq(4L))
  }

  test("table_changes TVF: batch CDC between two versions through plain SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.cdc (k INT, v STRING)")             // v1 (empty)
    sql("INSERT INTO graft.ns.cdc VALUES (1, 'a'), (2, 'b')")      // v2
    sql("INSERT INTO graft.ns.cdc VALUES (3, 'c')")                // v3
    // append lineage: the feed between v2 and v3 is the delta dir,
    // read directly as inserts — no table diff planned
    assert(rowsOf(
      "SELECT change_type, k, new_v FROM table_changes('graft.ns.cdc', 2, 3, 'k')") ==
      Set(Seq("insert", 3, "c")))
    // a DELETE breaks the pure-append short-circuit; the keyed snapshot
    // diff reports the tombstoned key as a delete
    sql("DELETE FROM graft.ns.cdc WHERE k = 1")                    // v4
    assert(rowsOf(
      "SELECT change_type, k, old_v, new_v FROM table_changes('graft.ns.cdc', 3, 4, 'k')") ==
      Set(Seq("delete", 1, "a", null)))
    // composes like any relation: filters, aggregates, joins
    assert(rowsOf(
      """SELECT change_type, count(*) AS n
         FROM table_changes('graft.ns.cdc', 2, 4, 'k')
         GROUP BY change_type""") ==
      Set(Seq("insert", 1L), Seq("delete", 1L)))
    // argument validation fails loudly, not silently
    val e = intercept[Exception](
      sql("SELECT * FROM table_changes('graft.ns.cdc', 1, 2)").collect())
    assert(e.getMessage.contains("4 arguments"), e.getMessage)
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only rename through plain SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.rn (k INT, v STRING)")
    sql("INSERT INTO graft.ns.rn VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE graft.ns.rn RENAME COLUMN v TO body")
    assert(sql("SELECT * FROM graft.ns.rn").columns.toSeq == Seq("k", "body"))
    assert(rowsOf("SELECT k, body FROM graft.ns.rn ORDER BY k") ==
      Set(Seq(1, "a"), Seq(2, "b")))
    // DML composes through the new name — and the lineage stays
    // physical: the insert + update land without touching old files
    sql("INSERT INTO graft.ns.rn VALUES (3, 'c')")
    sql("UPDATE graft.ns.rn SET body = 'b2' WHERE body = 'b'")
    sql("DELETE FROM graft.ns.rn WHERE body = 'a'")
    assert(rowsOf("SELECT k, body FROM graft.ns.rn") ==
      Set(Seq(2, "b2"), Seq(3, "c")))
    // time travel BEFORE the rename still shows the old column name
    assert(sql("SELECT * FROM graft.ns.rn VERSION AS OF 2").columns.toSeq ==
      Seq("k", "v"))
    // ALTER COLUMN TYPE widens metadata-only: old int files upcast
    sql("ALTER TABLE graft.ns.rn ALTER COLUMN k TYPE BIGINT")
    assert(sql("SELECT * FROM graft.ns.rn").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    sql("INSERT INTO graft.ns.rn VALUES (5000000000, 'big')")
    assert(rowsOf("SELECT k FROM graft.ns.rn WHERE k > 4000000000") ==
      Set(Seq(5000000000L)))
    // DROP COLUMN is metadata-only too; the table reads without it
    sql("ALTER TABLE graft.ns.rn DROP COLUMN body")
    val e = intercept[Exception](sql("SELECT body FROM graft.ns.rn").collect())
    assert(e.getMessage.contains("body"), e.getMessage)
    assert(rowsOf("SELECT * FROM graft.ns.rn") ==
      Set(Seq(2L), Seq(3L), Seq(5000000000L)))
    // ADD COLUMNS after a DROP: the catalog widens the VISIBLE schema,
    // so the tombstone neither blocks the evolution nor resurfaces
    sql("ALTER TABLE graft.ns.rn ADD COLUMNS (note STRING)")
    assert(sql("SELECT * FROM graft.ns.rn").columns.toSeq ==
      Seq("k", "note"))
    sql("INSERT INTO graft.ns.rn VALUES (9, 'n')")
    assert(rowsOf("SELECT k, note FROM graft.ns.rn WHERE k = 9") ==
      Set(Seq(9L, "n")))
  }

  test("classic MERGE on a FLAT stats table rewrites only matched files (round 10)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.ft (k INT, v STRING)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    // three appended dirs with disjoint k spans (INSERT derives spans
    // for k from the table property — no Scala API involved)
    sql("INSERT INTO graft.ns.ft SELECT id AS k, concat('w', id) AS v FROM range(0, 100)")
    sql("INSERT INTO graft.ns.ft SELECT id AS k, concat('w', id) AS v FROM range(100, 200)")
    sql("INSERT INTO graft.ns.ft SELECT id AS k, concat('w', id) AS v FROM range(200, 300)")
    val r = root("ft")
    def files(dir: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(new java.io.File(r), dir)
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val headBefore = SnapshotLog.currentVersion(spark, r).get
    val untouched = Seq(f"data_v${headBefore - 1}%08d", f"data_v$headBefore%08d")
    val before = untouched.map(d => d -> files(d)).toMap
    sql("""MERGE INTO graft.ns.ft t
           USING (SELECT 5 AS k, 'W5' AS v) s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET t.k = s.k, t.v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val head = SnapshotLog.currentVersion(spark, r).get
    assert(head == headBefore + 1)
    // O(matched files): the two dirs whose spans exclude k=5 are
    // carried by reference — bytes and mtimes untouched
    untouched.foreach { d =>
      assert(files(d) == before(d), s"$d was rewritten by a 1-row MERGE")
    }
    val dirs = SnapshotLog.dirsOf(spark, r, head)
    // k=5 lives in ONE file of the first insert's dir: that dir
    // dissolves into per-file carries (all but the matched file), and
    // every other dir is carried whole
    val (fileCarries, wholeDirs) = dirs.partition(_.endsWith(".parquet"))
    assert(wholeDirs.toSet ==
      (Set("data_v00000001", f"data_v$head%08d") ++ untouched), dirs.toString)
    assert(fileCarries.nonEmpty &&
      fileCarries.forall(_.startsWith("data_v00000002/")), dirs.toString)
    assert(rowsOf("SELECT v FROM graft.ns.ft WHERE k IN (5, 6)") ==
      Set(Seq("W5"), Seq("w6")))
    assert(sql("SELECT * FROM graft.ns.ft").count() == 300)
    // the property surfaces in DESCRIBE EXTENDED / properties()
    assert(spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sql.GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "ft"))
      .properties().get("graft.statsCols") == "k")
  }

  test("PARTITIONED BY (bucket(16, k), months(ts)): scoped MERGE, point-probe pruning, leaf identity, vacuum (round 11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.bkt (k BIGINT, ts TIMESTAMP_NTZ, v STRING)
           PARTITIONED BY (bucket(16, k), months(ts))""")
    val r = root("bkt")
    val rows = (0L until 64L).map(i =>
      s"(CAST($i AS BIGINT), TIMESTAMP_NTZ'2024-0${1 + (i % 3)}-10 12:00:00', 'v$i')")
    // classic keyed MERGE lowers onto the SCOPED path (bucket+months
    // components reference k and ts, both merge keys)
    sql(s"""MERGE INTO graft.ns.bkt t
            USING (SELECT * FROM VALUES ${rows.mkString(", ")} AS s(k, ts, v)) s
            ON t.k = s.k AND t.ts = s.ts
            WHEN MATCHED THEN UPDATE SET t.k = s.k, t.ts = s.ts, t.v = s.v
            WHEN NOT MATCHED THEN INSERT (k, ts, v) VALUES (s.k, s.ts, s.v)""")
    assert(SnapshotLog.manifestKind(spark, r, 2L).contains("scoped"))
    val leafs = SnapshotLog.dirsOf(spark, r, 2L)
      .map(d => d.substring(d.lastIndexOf('/') + 1))
    assert(leafs.forall(_.matches("__gp=\\d+\\|2024-\\d{2}")), leafs.toString)
    // point predicate on the bucket column prunes the file set
    val (kept, total) = SnapshotLog.candidateFiles(spark, r, 2L, "k", 7L, 7L)
    assert(kept.size < total && kept.nonEmpty, s"kept ${kept.size} of $total")
    assert(rowsOf("SELECT v FROM graft.ns.bkt WHERE k = 7") == Set(Seq("v7")))
    // a 1-key MERGE touches exactly one leaf; every other leaf is
    // byte/mtime identical (carried by reference)
    def filesOf(leaf: String): Map[String, Long] = {
      val d = new java.io.File(s"$r/data_v00000002/$leaf")
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val touchedLeaf = kept.head.getParent.getName
    val before = leafs.filterNot(_ == touchedLeaf).map(l => l -> filesOf(l)).toMap
    sql("""MERGE INTO graft.ns.bkt t
           USING (SELECT CAST(7 AS BIGINT) AS k,
                         TIMESTAMP_NTZ'2024-02-10 12:00:00' AS ts, 'V7' AS v) s
           ON t.k = s.k AND t.ts = s.ts
           WHEN MATCHED THEN UPDATE SET t.k = s.k, t.ts = s.ts, t.v = s.v
           WHEN NOT MATCHED THEN INSERT (k, ts, v) VALUES (s.k, s.ts, s.v)""")
    before.foreach { case (l, fs) => assert(filesOf(l) == fs, s"leaf $l moved") }
    assert(rowsOf("SELECT v FROM graft.ns.bkt WHERE k = 7") == Set(Seq("V7")))
    assert(sql("SELECT * FROM graft.ns.bkt").count() == 64)
    // months prunes on a ts range probe
    val (keptM, totalM) = SnapshotLog.candidateFiles(spark, r, 3L, "ts",
      java.time.LocalDateTime.parse("2024-03-01T00:00"),
      java.time.LocalDateTime.parse("2024-03-31T23:59"))
    assert(keptM.map(_.getParent.getName).forall(_.endsWith("2024-03")),
      s"kept ${keptM.map(_.getParent.getName)} of $totalM")
    // vacuum refcounts: carried v2 leafs survive v2's death because v3
    // still references them
    sql("CALL graft.system.vacuum('ns.bkt', 1)")
    assert(sql("SELECT * FROM graft.ns.bkt").count() == 64)
    assert(rowsOf("SELECT v FROM graft.ns.bkt WHERE k = 7") == Set(Seq("V7")))
  }

  test("scoped data-column rename via SQL; rebloom_widened procedure (round 11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    // ALTER ... RENAME COLUMN on a PARTITIONED BY table: data columns
    // rename metadata-only, the partition column refuses
    sql("""CREATE TABLE graft.ns.sren (k INT, p STRING, v STRING)
           PARTITIONED BY (p)""")
    sql("INSERT INTO graft.ns.sren VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    sql("ALTER TABLE graft.ns.sren RENAME COLUMN v TO body")
    assert(rowsOf("SELECT k, body FROM graft.ns.sren") ==
      Set(Seq(1, "x"), Seq(2, "y")))
    // the scoped MERGE keeps working under the renamed schema
    sql("""MERGE INTO graft.ns.sren t
           USING (SELECT 1 AS k, 'a' AS p, 'X' AS body) s
           ON t.k = s.k AND t.p = s.p
           WHEN MATCHED THEN UPDATE SET t.k = s.k, t.p = s.p, t.body = s.body
           WHEN NOT MATCHED THEN INSERT (k, p, body) VALUES (s.k, s.p, s.body)""")
    assert(rowsOf("SELECT k, body FROM graft.ns.sren") ==
      Set(Seq(1, "X"), Seq(2, "y")))
    val e = intercept[Exception] {
      sql("ALTER TABLE graft.ns.sren RENAME COLUMN p TO region")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("partition-spec")), msgs(e).toString)
    // rebloom_widened as a procedure: widen, then the targeted pass
    sql("CREATE TABLE graft.ns.rbw (id INT, v STRING)")
    sql("INSERT INTO graft.ns.rbw VALUES (1, 'a'), (9999, 'z')")
    sql("ALTER TABLE graft.ns.rbw ALTER COLUMN id TYPE BIGINT")
    val v = sql("CALL graft.system.rebloom_widened('ns.rbw')")
      .collect().head.getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, root("rbw")).get)
    assert(rowsOf("SELECT id FROM graft.ns.rbw") == Set(Seq(1L), Seq(9999L)))
  }

  test("generated columns via SQL: procedure declare, INSERT validates, UPDATE recomputes (round 12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.gen (k INT, v STRING, v_uc STRING)")
    sql("INSERT INTO graft.ns.gen VALUES (1, 'a', 'A')")
    sql("CALL graft.system.add_generated('ns.gen', 'v_uc', 'upper(v)')")
    assert(rowsOf("CALL graft.system.generated_cols('ns.gen')") ==
      Set(Seq("v_uc", "upper(v)")))
    // INSERT with a consistent value passes; inconsistent aborts with
    // the table unmoved
    sql("INSERT INTO graft.ns.gen VALUES (2, 'b', 'B')")
    intercept[Exception] {
      sql("INSERT INTO graft.ns.gen VALUES (3, 'c', 'WRONG')")
    }
    assert(rowsOf("SELECT k, v, v_uc FROM graft.ns.gen") ==
      Set(Seq(1, "a", "A"), Seq(2, "b", "B")))
    // UPDATE of the source column recomputes the derivation
    sql("UPDATE graft.ns.gen SET v = 'zz' WHERE k = 1")
    assert(rowsOf("SELECT k, v, v_uc FROM graft.ns.gen") ==
      Set(Seq(1, "zz", "ZZ"), Seq(2, "b", "B")))
    sql("CALL graft.system.drop_generated('ns.gen', 'v_uc')")
    assert(rowsOf("CALL graft.system.generated_cols('ns.gen')").isEmpty)
  }

  test("identity columns via SQL procedures: assign, sync, INSERT pass-through (round 12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.ident (id BIGINT, v STRING)")
    sql("CALL graft.system.add_identity('ns.ident', 'id', 10, 10)")
    // INSERT must spell every column (v2 arity) — explicit ids pass
    // through the BY DEFAULT door…
    sql("INSERT INTO graft.ns.ident VALUES (999, 'manual')")
    // …the Scala append path omits the column and gets assigned ids
    SnapshotLog.appendCommit(spark, root("ident"),
      spark.sql("SELECT 'auto' AS v"))
    // mark was never synced past 999 — sync, then the next assignment
    // clears it
    val mark = sql("CALL graft.system.sync_identity('ns.ident', 'id')")
      .collect().head.getLong(0)
    assert(mark == 999L)
    SnapshotLog.appendCommit(spark, root("ident"),
      spark.sql("SELECT 'after' AS v"))
    val got = rowsOf("SELECT id, v FROM graft.ns.ident")
    assert(got.exists(r => r(1) == "auto" && r(0) == 10L), got.toString)
    assert(got.exists(r => r(1) == "after" && r(0) == 1009L), got.toString)
    sql("CALL graft.system.drop_identity('ns.ident', 'id')")
  }

  test("row tracking via SQL: enable procedure + ids survive SQL UPDATE (round 12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.rt (k INT, v STRING)")
    sql("INSERT INTO graft.ns.rt VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val r = root("rt")
    sql("CALL graft.system.enable_row_tracking('ns.rt')")
    def ids(): Map[Int, Long] = SnapshotLog.readWithRowIds(spark, r)
      .select("k", "_row_id").collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    val before = ids()
    assert(before.size == 3 && before.values.toSet.size == 3)
    sql("UPDATE graft.ns.rt SET v = 'A' WHERE k = 1")
    sql("DELETE FROM graft.ns.rt WHERE k = 2")
    val after = ids()
    assert(after.size == 2 && after(1) == before(1) && after(3) == before(3),
      s"SQL DML moved identities: $before -> $after")
    // the hidden materialized column never leaks into SQL reads
    assert(sql("SELECT * FROM graft.ns.rt").columns.toSeq == Seq("k", "v"))
  }

  test("MERGE recomputes generated columns its actions do not assign (round 12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.genm (k INT, v STRING, v_uc STRING)")
    sql("INSERT INTO graft.ns.genm VALUES (1, 'a', 'A'), (2, 'b', 'B')")
    sql("CALL graft.system.add_generated('ns.genm', 'v_uc', 'upper(v)')")
    // multi-clause MERGE whose UPDATE/INSERT touch only k and v: the
    // derivation refreshes on updated rows and fills on inserted ones
    sql("""MERGE INTO graft.ns.genm t
           USING (SELECT 1 AS k, 'new' AS v UNION ALL
                  SELECT 3 AS k, 'c' AS v) s
           ON t.k = s.k
           WHEN MATCHED AND s.v != 'never' THEN UPDATE SET t.v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(rowsOf("SELECT k, v, v_uc FROM graft.ns.genm") ==
      Set(Seq(1, "new", "NEW"), Seq(2, "b", "B"), Seq(3, "c", "C")))
  }

  test("MERGE recomputes generated columns PER ACTION (round 13, ADVICE)") {
    // action 1 assigns v_uc explicitly, action 2 does not: the
    // cross-action-union bug left action-2 rows with the stale value
    // (and the gate's FAIL expectation then aborted spuriously)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.genpa (k INT, v STRING, v_uc STRING)")
    sql("INSERT INTO graft.ns.genpa VALUES (1, 'a', 'A'), (2, 'b', 'B')")
    sql("CALL graft.system.add_generated('ns.genpa', 'v_uc', 'upper(v)')")
    sql("""MERGE INTO graft.ns.genpa t
           USING (SELECT 1 AS k, 'x' AS v UNION ALL
                  SELECT 2 AS k, 'y' AS v UNION ALL
                  SELECT 3 AS k, 'z' AS v) s
           ON t.k = s.k
           WHEN MATCHED AND s.k = 1
             THEN UPDATE SET t.v = s.v, t.v_uc = upper(s.v)
           WHEN MATCHED THEN UPDATE SET t.v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(rowsOf("SELECT k, v, v_uc FROM graft.ns.genpa") ==
      Set(Seq(1, "x", "X"), Seq(2, "y", "Y"), Seq(3, "z", "Z")))
  }

  test("CALL graft.system.ann_build / ann_refresh: persisted ANN through SQL (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.emb (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sql("""INSERT INTO graft.ns.emb
           SELECT id AS vec_id,
                  transform(sequence(0, 7), d ->
                    cast(if(d = id % 4, 1.0, 0.02 * pmod(id + d, 7)) AS FLOAT))
                    AS embedding
           FROM range(80)""")
    val r = root("emb")
    val v = sql("CALL graft.system.ann_build('ns.emb', 'vec_id', 'embedding', 4)")
      .collect().head.getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, r).get)
    val q = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val hit = graft.engine.AnnIndex.knn(spark, r, q, k = 3, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(hit.length == 3 && hit.forall(_ % 4 == 0),
      s"axis-0 query must retrieve axis-0 vectors: ${hit.toSeq}")
    sql("""INSERT INTO graft.ns.emb
           SELECT id + 1000 AS vec_id,
                  transform(sequence(0, 7), d ->
                    cast(if(d = 0, 2.0, 0.0) AS FLOAT)) AS embedding
           FROM range(2)""")
    val v2 = sql("CALL graft.system.ann_refresh('ns.emb')")
      .collect().head.getLong(0)
    assert(v2 == SnapshotLog.currentVersion(spark, r).get)
    val hit2 = graft.engine.AnnIndex.knn(spark, r, q, k = 2, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(hit2.forall(_ >= 1000L),
      s"exact-axis appends must win the axis query: ${hit2.toSeq}")
  }

  test("mv_refresh: incremental materialized views maintained through SQL (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.facts (id INT, grp STRING, amt DOUBLE, qty DOUBLE)")
    sql("""INSERT INTO graft.ns.facts VALUES
           (1,'a',10.0,2.0),(2,'a',3.0,1.0),(3,'b',7.0,4.0)""")
    def expectRows = sql(
      """SELECT grp, count(*) AS n_rows,
                CAST(sum(coalesce(amt, 0)) AS DECIMAL(38,6)) AS sum_amt,
                CAST(sum(coalesce(qty, 0)) AS DECIMAL(38,6)) AS sum_qty
         FROM graft.ns.facts GROUP BY grp""")
      .collect().map(_.toSeq.map(Option(_))).toSet
    def mvRows = sql(
      "SELECT grp, n_rows, sum_amt, sum_qty FROM graft.ns.facts_mv")
      .collect().map(_.toSeq.map(Option(_))).toSet
    val r1 = sql("""CALL graft.system.mv_refresh('ns.facts', 'ns.facts_mv',
           'grp', 'amt,qty', 'id', false, 'mv_facts')""").collect().head
    assert(!r1.isNullAt(1) && mvRows == expectRows)
    // churn every way, refresh again, the pin followed the view
    sql("INSERT INTO graft.ns.facts VALUES (4,'b',1.0,1.0)")
    sql("UPDATE graft.ns.facts SET grp = 'c' WHERE id = 1")
    sql("DELETE FROM graft.ns.facts WHERE id = 2")
    sql("""CALL graft.system.mv_refresh('ns.facts', 'ns.facts_mv',
           'grp', 'amt,qty', 'id', false, 'mv_facts')""").collect()
    assert(mvRows == expectRows)
    val pins = sql("CALL graft.system.consumers('ns.facts')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pins.get("mv_facts").contains(
      SnapshotLog.currentVersion(spark, root("facts")).get))
    // already current → NULL range, view untouched
    val r3 = sql("""CALL graft.system.mv_refresh('ns.facts', 'ns.facts_mv',
           'grp', 'amt,qty', 'id', false, '')""").collect().head
    assert(r3.isNullAt(0) && r3.isNullAt(1))
    // KEYLESS form (keys = '') over a row-tracked source, with extrema
    sql("CREATE TABLE graft.ns.kfacts (id INT, grp STRING, amt DOUBLE)")
    sql("INSERT INTO graft.ns.kfacts VALUES (1,'a',5.0),(2,'b',2.0)")
    sql("CALL graft.system.enable_row_tracking('ns.kfacts')")
    sql("""CALL graft.system.mv_refresh('ns.kfacts', 'ns.kfacts_mv',
           'grp', 'amt', '', true, '')""").collect()
    sql("INSERT INTO graft.ns.kfacts VALUES (3,'a',1.0)")
    sql("DELETE FROM graft.ns.kfacts WHERE id = 2")
    sql("""CALL graft.system.mv_refresh('ns.kfacts', 'ns.kfacts_mv',
           'grp', 'amt', '', true, '')""").collect()
    val kGot = sql(
      "SELECT grp, n_rows, sum_amt, min_amt, max_amt FROM graft.ns.kfacts_mv")
      .collect().map(_.toSeq.map(Option(_))).toSet
    val kExp = sql(
      """SELECT grp, count(*) AS n_rows,
                CAST(sum(coalesce(amt, 0)) AS DECIMAL(38,6)) AS sum_amt,
                min(amt) AS min_amt, max(amt) AS max_amt
         FROM graft.ns.kfacts GROUP BY grp""")
      .collect().map(_.toSeq.map(Option(_))).toSet
    assert(kGot == kExp)
  }

  test("mv_refresh_distinct: sketch-backed COUNT DISTINCT views through SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.dfacts (grp STRING, uid BIGINT)")
    sql("INSERT INTO graft.ns.dfacts VALUES ('a',1),('a',2),('a',1),('b',9)")
    sql("""CALL graft.system.mv_refresh_distinct('ns.dfacts',
           'ns.dfacts_dv', 'grp', 'uid', '')""").collect()
    sql("INSERT INTO graft.ns.dfacts VALUES ('a',2),('a',3),('c',5)")
    val r = sql("""CALL graft.system.mv_refresh_distinct('ns.dfacts',
           'ns.dfacts_dv', 'grp', 'uid', 'dv_pin')""").collect().head
    assert(!r.isNullAt(1))
    val got = sql(
      "SELECT grp, n_rows, distinct_est_uid FROM graft.ns.dfacts_dv")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val want = sql(
      """SELECT grp, count(*), count(DISTINCT uid)
         FROM graft.ns.dfacts GROUP BY grp""")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == want, s"$got != $want")
    val pins = sql("CALL graft.system.consumers('ns.dfacts')")
      .collect().map(_.getString(0)).toSet
    assert(pins.contains("dv_pin"))
  }

  test("ann_indexes: freshness observability for every persisted index") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.emb3 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sql("""INSERT INTO graft.ns.emb3
           SELECT id, transform(sequence(0, 7), d ->
             cast(if(d = id % 4, 1.0, 0.0) AS FLOAT)) FROM range(40)""")
    sql("CALL graft.system.ann_build('ns.emb3', 'vec_id', 'embedding', 4)")
    def listing() = sql("CALL graft.system.ann_indexes('ns.emb3')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(6)))
    assert(listing().toSeq == Seq(("ivf", "ivf", false)))
    sql("""INSERT INTO graft.ns.emb3
           SELECT id + 100, transform(sequence(0, 7), d ->
             cast(if(d = 0, 2.0, 0.0) AS FLOAT)) FROM range(2)""")
    assert(listing().toSeq == Seq(("ivf", "ivf", true)), "append not seen as stale")
    sql("CALL graft.system.ann_refresh('ns.emb3')")
    assert(listing().toSeq == Seq(("ivf", "ivf", false)))
    // drop through SQL: sidecar gone, vacuum pin released, listing empty
    sql("CALL graft.system.ann_drop('ns.emb3', 'ivf')")
    assert(sql("CALL graft.system.ann_indexes('ns.emb3')").collect().isEmpty)
    assert(!sql("CALL graft.system.consumers('ns.emb3')")
      .collect().exists(_.getString(0) == "ann_ivf"), "pin not released")
  }

  test("ann_knn_batch TVF: a query VIEW answers in one pass, per-row equal to ann_knn (r15)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.embb (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sql("""INSERT INTO graft.ns.embb
           SELECT id AS vec_id,
                  transform(sequence(0, 7), d ->
                    cast(if(d = id % 4, 1.0, 0.02 * pmod(id + d, 7)) AS FLOAT))
                    AS embedding
           FROM range(80)""")
    sql("CALL graft.system.ann_build('ns.embb', 'vec_id', 'embedding', 4)")
    // the batch is any resolvable view with (qid, qvec) rows — here
    // three of the table's own vectors
    sql("""CREATE OR REPLACE TEMPORARY VIEW qbatch AS
           SELECT vec_id AS qid, embedding AS qvec
           FROM graft.ns.embb WHERE vec_id IN (3, 17, 42)""")
    val got = sql(
      "SELECT * FROM ann_knn_batch('graft.ns.embb', 'qbatch', 4, 'ivf', 2)")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r =>
        (r.getLong(1), r.getDouble(2))).toSeq }
    assert(got.keySet == Set(3L, 17L, 42L))
    val r = root("embb")
    got.keySet.foreach { qid =>
      val qv = sql(s"SELECT embedding FROM graft.ns.embb WHERE vec_id = $qid")
        .head().getSeq[Float](0)
      val single = graft.engine.AnnIndex.knn(spark, r, qv, k = 4, nprobe = 2)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(got(qid) == single, s"qid $qid: ${got(qid)} != $single")
    }
    // the ivfpq kind through the 8-arg form (r16 — the r15 refusal
    // lifted): chunked ADC batch, still per-row equal to per-query knn
    graft.engine.AnnIndex.buildPq(spark, r, "ivfpq", kCells = 4, m = 4,
      kPq = 16)
    val gotPq = sql("SELECT * FROM ann_knn_batch('graft.ns.embb', " +
      "'qbatch', 3, 'ivfpq', 2, 'qid', 'qvec', 12)")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(x =>
        (x.getLong(1), x.getDouble(2))).toSeq }
    assert(gotPq.keySet == Set(3L, 17L, 42L))
    gotPq.keySet.foreach { qid =>
      val qv = sql(s"SELECT embedding FROM graft.ns.embb WHERE vec_id = $qid")
        .head().getSeq[Float](0)
      val single = graft.engine.AnnIndex.knn(spark, r, qv, k = 3,
        name = "ivfpq", nprobe = 2, shortlist = 12)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(gotPq(qid) == single, s"ivfpq qid $qid: ${gotPq(qid)} != $single")
    }
  }

  test("ann_knn TVF + ann_compact: index queries and maintenance stay in SQL (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.emb2 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sql("""INSERT INTO graft.ns.emb2
           SELECT id AS vec_id,
                  transform(sequence(0, 7), d ->
                    cast(if(d = id % 4, 1.0, 0.02 * pmod(id + d, 7)) AS FLOAT))
                    AS embedding
           FROM range(80)""")
    sql("CALL graft.system.ann_build('ns.emb2', 'vec_id', 'embedding', 4)")
    val r = root("emb2")
    val q = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val api = graft.engine.AnnIndex.knn(spark, r, q, k = 3, nprobe = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    // 3-arg form: constant array query, default index + nprobe
    val tvf = sql(
      """SELECT * FROM ann_knn('graft.ns.emb2',
           array(1.0, 0, 0, 0, 0, 0, 0, 0), 3)""")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(tvf == api, s"$tvf != $api")
    // 5-arg form picks the index name and probe width; a CSV-string
    // query vector is accepted too
    val tvf5 = sql(
      "SELECT * FROM ann_knn('graft.ns.emb2', '1,0,0,0,0,0,0,0', 3, 'ivf', 2)")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(tvf5 == api, s"$tvf5 != $api")
    // a DELETE makes the index stale → the TVF refuses loudly; refresh
    // through SQL repairs it and the deleted id leaves the results
    val victim = api.head._1
    sql(s"DELETE FROM graft.ns.emb2 WHERE vec_id = $victim")
    val e = intercept[Exception] {
      sql("SELECT * FROM ann_knn('graft.ns.emb2', '1,0,0,0,0,0,0,0', 3)").collect()
    }
    assert(e.getMessage.contains("refresh"), e.getMessage)
    sql("CALL graft.system.ann_refresh('ns.emb2')")
    val after = sql(
      "SELECT * FROM ann_knn('graft.ns.emb2', '1,0,0,0,0,0,0,0', 79)")
      .collect().map(_.getLong(0)).toSeq
    assert(!after.contains(victim) && after.distinct.size == after.size)
    // 6-arg form: hybrid search with a SQL predicate over table columns
    val filtered = sql(
      "SELECT * FROM ann_knn('graft.ns.emb2', '1,0,0,0,0,0,0,0', 5, " +
      "'ivf', 2, 'vec_id % 2 = 0')")
      .collect().map(_.getLong(0)).toSeq
    assert(filtered.size == 5 && filtered.forall(_ % 2 == 0),
      filtered.toString)
    // compaction through SQL: one merged slice, same answers
    val v = sql("CALL graft.system.ann_compact('ns.emb2')")
      .collect().head.getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, r).get)
    val afterCompact = sql(
      "SELECT * FROM ann_knn('graft.ns.emb2', '1,0,0,0,0,0,0,0', 79)")
      .collect().map(_.getLong(0)).toSeq
    assert(afterCompact == after, "compaction changed query answers")
  }

  test("CALL graft.system.repartition: spec evolution through SQL (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.pse (k INT, region STRING, v STRING) PARTITIONED BY (region)")
    sql("INSERT INTO graft.ns.pse VALUES (1, 'us', 'a'), (2, 'eu', 'b')")
    val v = sql("CALL graft.system.repartition('ns.pse', 'region,bucket(4, k)')")
      .collect().head.getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, root("pse")).get)
    // rows intact; a MERGE routed by the catalog's updated partitioning
    // lands under the new composite spec and migrates the touched leaf
    sql("""MERGE INTO graft.ns.pse t USING (SELECT 1 AS k, 'us' AS region, 'A' AS v) s
           ON t.k = s.k AND t.region = s.region
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    assert(rowsOf("SELECT k, region, v FROM graft.ns.pse") ==
      Set(Seq(1, "us", "A"), Seq(2, "eu", "b")))
    val head = SnapshotLog.currentVersion(spark, root("pse")).get
    val leafs = SnapshotLog.dirsOf(spark, root("pse"), head)
      .map(d => d.substring(d.lastIndexOf('/') + 1))
    assert(leafs.exists(_.contains("%7C")) || leafs.exists(_.contains("|")),
      s"expected a composite leaf after the migrating MERGE: $leafs")
  }

  test("table_changes_by_rowid TVF: keyless CDC through plain SQL (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.rtc (k INT, v STRING)")
    sql("INSERT INTO graft.ns.rtc VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val r = root("rtc")
    sql("CALL graft.system.enable_row_tracking('ns.rtc')")
    val v1 = SnapshotLog.currentVersion(spark, r).get
    sql("UPDATE graft.ns.rtc SET v = 'B' WHERE k = 2")
    sql("INSERT INTO graft.ns.rtc VALUES (4, 'd')")
    val v2 = SnapshotLog.currentVersion(spark, r).get
    val viaSql = rowsOf(
      s"SELECT k, v, _change_type FROM table_changes_by_rowid('graft.ns.rtc', $v1, $v2)")
    assert(viaSql == Set(
      Seq(2, "b", "update_preimage"), Seq(2, "B", "update_postimage"),
      Seq(4, "d", "insert")), viaSql.toString)
    // round-trips the Scala API exactly (ids included)
    val scalaRows = SnapshotLog.changesByRowId(spark, r, v1, v2)
      .select("k", "v", "_row_id", "_change_type").collect()
      .map(_.toSeq).toSet
    val sqlRows = rowsOf(
      s"SELECT k, v, _row_id, _change_type FROM table_changes_by_rowid('graft.ns.rtc', $v1, $v2)")
    assert(sqlRows == scalaRows, s"$sqlRows != $scalaRows")
  }

  test("COW UPDATE and general-MERGE fallback keep row identities (round 13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    // a PARTITIONED table's simple UPDATE takes the copy-on-write
    // fallback (no DV+append on scoped layouts) — identities must
    // thread through the full rewrite
    sql("CREATE TABLE graft.ns.rtu (k INT, p STRING, v STRING) PARTITIONED BY (p)")
    sql("""INSERT INTO graft.ns.rtu VALUES
           (1, 'us', 'a'), (2, 'eu', 'b'), (3, 'us', 'c')""")
    sql("CALL graft.system.enable_row_tracking('ns.rtu')")
    def ids(t: String): Map[Int, Long] =
      SnapshotLog.readWithRowIds(spark, root(t))
        .select("k", "_row_id").collect()
        .map(x => x.getInt(0) -> x.getLong(1)).toMap
    val before = ids("rtu")
    sql("UPDATE graft.ns.rtu SET v = 'Z' WHERE k = 2")
    val after = ids("rtu")
    assert(after == before,
      s"COW UPDATE moved identities: $before -> $after")
    assert(rowsOf("SELECT k, v FROM graft.ns.rtu WHERE k = 2") ==
      Set(Seq(2, "Z")))
    assert(sql("SELECT * FROM graft.ns.rtu").columns.toSeq ==
      Seq("k", "p", "v"), "the id column must not leak into SQL reads")

    // multi-clause MERGE on an unstatted flat table: the pruned path is
    // ineligible → full-snapshot fallback; ids re-attach by key
    sql("CREATE TABLE graft.ns.rtm (k INT, v STRING)")
    sql("INSERT INTO graft.ns.rtm VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("CALL graft.system.enable_row_tracking('ns.rtm')")
    val b2 = ids("rtm")
    sql("""MERGE INTO graft.ns.rtm t
           USING (SELECT 2 AS k, 'B' AS v UNION ALL
                  SELECT 4 AS k, 'd' AS v) s
           ON t.k = s.k
           WHEN MATCHED AND s.v = 'B' THEN UPDATE SET t.v = s.v
           WHEN MATCHED THEN DELETE
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val a2 = ids("rtm")
    assert(a2.size == 4)
    Seq(1, 2, 3).foreach(k => assert(a2(k) == b2(k),
      s"MERGE fallback moved id for k=$k"))
    assert(a2(4) > b2.values.max, "MERGE insert must take a fresh id")
    assert(rowsOf("SELECT k, v FROM graft.ns.rtm") ==
      Set(Seq(1, "a"), Seq(2, "B"), Seq(3, "c"), Seq(4, "d")))
  }

  test("CALL graft.system.purge_deleted materializes deletion vectors (round 12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.prg (k INT, v STRING)")
    sql("INSERT INTO graft.ns.prg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("DELETE FROM graft.ns.prg WHERE k = 2") // merge-on-read vector
    val r = root("prg")
    assert(SnapshotLog.tombDirsOf(spark, r,
      SnapshotLog.currentVersion(spark, r).get).nonEmpty,
      "fixture drift: SQL DELETE should write a deletion vector")
    val v = sql("CALL graft.system.purge_deleted('ns.prg')")
      .collect().head.getLong(0)
    assert(v == SnapshotLog.currentVersion(spark, r).get)
    assert(SnapshotLog.tombDirsOf(spark, r, v).isEmpty,
      "purge must drop every vector from the head")
    assert(rowsOf("SELECT k, v FROM graft.ns.prg") ==
      Set(Seq(1, "a"), Seq(3, "c")))
    // DML keeps composing on the purged head
    sql("UPDATE graft.ns.prg SET v = 'A' WHERE k = 1")
    assert(rowsOf("SELECT k, v FROM graft.ns.prg") ==
      Set(Seq(1, "A"), Seq(3, "c")))
  }

  test("CALL graft.system.clones enumerates clone pins; DROP TABLE releases (round 11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.csrc (k INT, v STRING)")
    sql("INSERT INTO graft.ns.csrc VALUES (1, 'a')")
    sql("CALL graft.system.clone('ns.csrc', 'ns.cdst')")
    val pins = rowsOf("CALL graft.system.clones('ns.csrc')")
    assert(pins.size == 1 && pins.head(1) ==
      SnapshotLog.currentVersion(spark, root("csrc")).get, pins.toString)
    // dropping the clone releases its pin on the source
    sql("DROP TABLE graft.ns.cdst")
    assert(rowsOf("CALL graft.system.clones('ns.csrc')").isEmpty)
  }

  test("constraints bind WRITTEN rows only; UPDATE paths gate; ADD validates existing (round 11)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.wr (k INT, v STRING)")
    sql("INSERT INTO graft.ns.wr VALUES (1, 'dirtyverylong'), (2, 'ok'), (3, 'x')")
    // a FAIL add over data that violates it is REFUSED with the count
    val eAdd = intercept[Exception] {
      sql("ALTER TABLE graft.ns.wr ADD CONSTRAINT v_cap CHECK (length(v) <= 5)")
    }
    assert(msgs(eAdd).exists(_.contains("existing row")), msgs(eAdd).toString)
    assert(rowsOf("CALL graft.system.constraints('ns.wr')").isEmpty)
    // tolerant DROP policy may be declared over the same dirty data
    sql("CALL graft.system.add_constraint('ns.wr', 'v_short', 'length(v) <= 5', 'DROP')")
    sql("ALTER TABLE graft.ns.wr ADD CONSTRAINT k_cap CHECK (k < 100)")
    // ADVICE (high): UPDATE on a flat table lowers onto the merge-on-read
    // OCC path — a SET writing a FAIL violation must abort, table unmoved
    val vBefore = SnapshotLog.currentVersion(spark, root("wr")).get
    val e = intercept[Exception] {
      sql("UPDATE graft.ns.wr SET k = 500 WHERE v = 'ok'")
    }
    assert(msgs(e).exists(_.contains("k_cap")), msgs(e).toString)
    assert(SnapshotLog.currentVersion(spark, root("wr")).contains(vBefore))
    assert(rowsOf("SELECT k FROM graft.ns.wr") == Set(Seq(1), Seq(2), Seq(3)))
    val leaked = new java.io.File(root("wr")).listFiles()
      .map(_.getName).filter(n => n.startsWith("data_u") || n.startsWith("tomb_u"))
    assert(leaked.isEmpty, s"staged UPDATE debris: ${leaked.toSeq}")
    // an unrelated UPDATE must NOT let the DROP policy delete the
    // pre-existing violating row — carried rows are constraint-exempt
    sql("UPDATE graft.ns.wr SET v = 'y' WHERE k = 3")
    assert(rowsOf("SELECT k, v FROM graft.ns.wr") ==
      Set(Seq(1, "dirtyverylong"), Seq(2, "ok"), Seq(3, "y")))
    // general MERGE fallback (non-pure-equality ON → full COW rewrite):
    // the dirty carried row rides the rewrite ungated via the written
    // marker; the written row passes and lands
    sql("""MERGE INTO graft.ns.wr t USING (SELECT 3 AS k, 'mrg' AS v) s
           ON t.k = s.k AND length(s.v) > 0
           WHEN MATCHED THEN UPDATE SET t.v = s.v""")
    assert(rowsOf("SELECT k, v FROM graft.ns.wr") ==
      Set(Seq(1, "dirtyverylong"), Seq(2, "ok"), Seq(3, "mrg")))
    // a WRITTEN violating value under DROP removes the row (the written
    // copy is filtered; its old position is already tombstoned)
    sql("UPDATE graft.ns.wr SET v = 'thisiswaytoolong' WHERE k = 2")
    assert(rowsOf("SELECT k FROM graft.ns.wr") == Set(Seq(1), Seq(3)))

    // pruned multi-clause MERGE (stats table): carried rows inside the
    // MATCHED slice stay exempt too — the file holding the dirty row is
    // rewritten because key 2 lives there, the dirty row must survive
    sql("""CREATE TABLE graft.ns.wrm (k INT, v STRING)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    sql("INSERT INTO graft.ns.wrm VALUES (1, 'dirtyverylong'), (2, 'ok')")
    sql("INSERT INTO graft.ns.wrm VALUES (10, 'x')")
    sql("CALL graft.system.add_constraint('ns.wrm', 'v_short', 'length(v) <= 5', 'DROP')")
    sql("""MERGE INTO graft.ns.wrm t
           USING (SELECT 2 AS k, 'mrg' AS v UNION ALL SELECT 20, 'in') s
           ON t.k = s.k
           WHEN MATCHED AND t.v = 'nope' THEN DELETE
           WHEN MATCHED THEN UPDATE SET t.v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(rowsOf("SELECT k, v FROM graft.ns.wrm") ==
      Set(Seq(1, "dirtyverylong"), Seq(2, "mrg"), Seq(10, "x"), Seq(20, "in")))

    // scoped table: the COW UPDATE path gates written rows only as well
    sql("""CREATE TABLE graft.ns.wrp (k INT, v STRING, p STRING)
           PARTITIONED BY (p)""")
    sql("""INSERT INTO graft.ns.wrp VALUES (1, 'dirtyverylong', 'a'),
           (2, 'ok', 'a'), (3, 'x', 'b')""")
    sql("CALL graft.system.add_constraint('ns.wrp', 'v_short', 'length(v) <= 5', 'DROP')")
    sql("UPDATE graft.ns.wrp SET v = 'z' WHERE k = 3")
    assert(rowsOf("SELECT k, v FROM graft.ns.wrp") ==
      Set(Seq(1, "dirtyverylong"), Seq(2, "ok"), Seq(3, "z")))
    sql("ALTER TABLE graft.ns.wrp ADD CONSTRAINT k_cap CHECK (k < 100)")
    val e2 = intercept[Exception] {
      sql("UPDATE graft.ns.wrp SET k = 500 WHERE v = 'z'")
    }
    assert(msgs(e2).exists(_.contains("k_cap")), msgs(e2).toString)
    assert(rowsOf("SELECT k FROM graft.ns.wrp") == Set(Seq(1), Seq(2), Seq(3)))
  }

  test("constraint lifecycle: ADD CONSTRAINT gates SQL DML, audit records, DROP frees") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.ct (k INT, v STRING)")
    sql("INSERT INTO graft.ns.ct VALUES (1, 'a')")
    // ANSI syntax declares standard CHECK behavior: violations FAIL
    sql("ALTER TABLE graft.ns.ct ADD CONSTRAINT k_positive CHECK (k > 0)")
    assert(rowsOf("CALL graft.system.constraints('ns.ct')") ==
      Set(Seq("k_positive", "FAIL", "k > 0")))
    // clean insert passes and records a zero-violation audit
    sql("INSERT INTO graft.ns.ct VALUES (2, 'b')")
    val cleanV = SnapshotLog.currentVersion(spark, root("ct")).get
    assert(rowsOf(s"CALL graft.system.audit('ns.ct', $cleanV)") ==
      Set(Seq("rows_in", 1L), Seq("k_positive", 0L)))
    // violating insert aborts; the table does not move
    val e = intercept[Exception] {
      sql("INSERT INTO graft.ns.ct VALUES (-5, 'bad')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("k_positive")), msgs(e).toString)
    assert(SnapshotLog.currentVersion(spark, root("ct")).contains(cleanV))
    assert(rowsOf("SELECT k FROM graft.ns.ct") == Set(Seq(1), Seq(2)))
    // ANSI NULL semantics: a NULL check passes (unlike the strict
    // Scala-side Expectations)
    sql("INSERT INTO graft.ns.ct VALUES (NULL, 'nullk')")
    assert(sql("SELECT * FROM graft.ns.ct").count() == 3)
    // DROP-policy constraint via the CALL surface: violating rows are
    // removed, counted in the audit, the commit lands
    sql("CALL graft.system.add_constraint('ns.ct', 'v_short', 'length(v) <= 3', 'DROP')")
    sql("INSERT INTO graft.ns.ct VALUES (7, 'ok'), (8, 'waytoolong')")
    val dropV = SnapshotLog.currentVersion(spark, root("ct")).get
    assert(rowsOf("SELECT k FROM graft.ns.ct WHERE k IN (7, 8)") ==
      Set(Seq(7)))
    assert(rowsOf(s"CALL graft.system.audit('ns.ct', $dropV)") ==
      Set(Seq("rows_in", 2L), Seq("k_positive", 0L), Seq("v_short", 1L)))
    // a MERGE is gated too (classic keyed shape on this flat table)
    val e2 = intercept[Exception] {
      sql("""MERGE INTO graft.ns.ct t USING (SELECT -9 AS k, 'x' AS v) s
             ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET t.k = s.k, t.v = s.v
             WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(msgs(e2).exists(_.contains("k_positive")), msgs(e2).toString)
    // DROP CONSTRAINT frees the gate
    sql("ALTER TABLE graft.ns.ct DROP CONSTRAINT k_positive")
    sql("CALL graft.system.drop_constraint('ns.ct', 'v_short')")
    assert(rowsOf("CALL graft.system.constraints('ns.ct')").isEmpty)
    sql("INSERT INTO graft.ns.ct VALUES (-5, 'finally')")
    assert(rowsOf("SELECT v FROM graft.ns.ct WHERE k = -5") ==
      Set(Seq("finally")))
    // an unresolvable CHECK is refused at ADD time
    val e3 = intercept[Exception] {
      sql("ALTER TABLE graft.ns.ct ADD CONSTRAINT bad CHECK (no_such_col > 0)")
    }
    assert(msgs(e3).nonEmpty)
  }

  test("general multi-clause MERGE on a FLAT stats table is file-granular too (round 10)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.gm (k INT, v STRING, amt INT)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    sql("INSERT INTO graft.ns.gm SELECT id AS k, concat('w', id) AS v, 10 AS amt FROM range(0, 100)")
    sql("INSERT INTO graft.ns.gm SELECT id AS k, concat('w', id) AS v, 10 AS amt FROM range(100, 200)")
    sql("INSERT INTO graft.ns.gm SELECT id AS k, concat('w', id) AS v, 10 AS amt FROM range(200, 300)")
    val r = root("gm")
    def files(dir: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(new java.io.File(r), dir)
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val headBefore = SnapshotLog.currentVersion(spark, r).get
    // the last two inserts' dirs hold k >= 100: untouched by source keys 5/7/999
    val untouched = Seq(f"data_v${headBefore - 1}%08d", f"data_v$headBefore%08d")
    val before = untouched.map(d => d -> files(d)).toMap
    spark.conf.set("graft.changeFeed.enabled", "true")
    try {
      // update k=5, delete k=7, insert k=999 — three clause kinds in one
      sql("""MERGE INTO graft.ns.gm t
             USING (SELECT * FROM VALUES (5, 'U5', 50), (7, 'D7', 0),
                    (999, 'N999', 99) AS s(k, v, amt)) s
             ON t.k = s.k
             WHEN MATCHED AND s.amt = 0 THEN DELETE
             WHEN MATCHED THEN UPDATE SET t.v = s.v, t.amt = s.amt
             WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
      val head = SnapshotLog.currentVersion(spark, r).get
      assert(head == headBefore + 1)
      untouched.foreach { d =>
        assert(files(d) == before(d), s"$d was rewritten by a 3-key MERGE")
      }
      // the first insert's dir dissolved into per-file carries
      val dirs = SnapshotLog.dirsOf(spark, r, head)
      assert(dirs.exists(_.endsWith(".parquet")), dirs.toString)
      // rows: exact multi-clause semantics
      assert(rowsOf("SELECT v, amt FROM graft.ns.gm WHERE k IN (5, 999)") ==
        Set(Seq("U5", 50), Seq("N999", 99)))
      assert(sql("SELECT * FROM graft.ns.gm WHERE k = 7").count() == 0)
      assert(sql("SELECT * FROM graft.ns.gm").count() == 300) // -1 del +1 ins
      // the feed recorded the exact keyed diff — deletes included
      val diff = SnapshotLog.changesBetween(spark, r, headBefore, head, Seq("k"))
      assert(!diff.queryExecution.optimizedPlan.toString.contains("Join"),
        "recorded change files must make the fold join-free")
      assert(diff.collect().map(t => (t.getString(0), t.getInt(1))).toSet ==
        Set(("update", 5), ("delete", 7), ("insert", 999)))
    } finally spark.conf.unset("graft.changeFeed.enabled")
  }

  test("days() over LTZ pins the CREATE-time zone: stable identity + day pruning (round 10)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        case f: FileSourceScanExec => Seq(f)
      }.flatten.map(_.metrics("numFiles").value).sum
    }
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    val zoneBefore = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      sql("CREATE TABLE graft.ns.ev (id INT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
      // the CREATE-time zone is pinned into the partition spec
      assert(spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[graft.sql.GraftCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ns"), "ev"))
        .properties().get("partition-column") == "days(ts@America/New_York)")
      // NY wall clock 2024-03-05 20:00 → NY day 2024-03-05
      sql("""MERGE INTO graft.ns.ev t
             USING (SELECT 1 AS id, TIMESTAMP'2024-03-05 20:00:00' AS ts) s
             ON t.id = s.id AND t.ts = s.ts
             WHEN MATCHED THEN UPDATE SET t.id = s.id, t.ts = s.ts
             WHEN NOT MATCHED THEN INSERT (id, ts) VALUES (s.id, s.ts)""")
      // a writer in a DIFFERENT session zone derives the SAME partition:
      // UTC 2024-03-06 01:00 is the same instant-era as NY 03-05 evening
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      sql("""MERGE INTO graft.ns.ev t
             USING (SELECT 2 AS id, TIMESTAMP'2024-03-06 01:00:00' AS ts) s
             ON t.id = s.id AND t.ts = s.ts
             WHEN MATCHED THEN UPDATE SET t.id = s.id, t.ts = s.ts
             WHEN NOT MATCHED THEN INSERT (id, ts) VALUES (s.id, s.ts)""")
      sql("""MERGE INTO graft.ns.ev t
             USING (SELECT 3 AS id, TIMESTAMP'2024-03-07 12:00:00' AS ts) s
             ON t.id = s.id AND t.ts = s.ts
             WHEN MATCHED THEN UPDATE SET t.id = s.id, t.ts = s.ts
             WHEN NOT MATCHED THEN INSERT (id, ts) VALUES (s.id, s.ts)""")
      val r = root("ev")
      val head = SnapshotLog.currentVersion(spark, r).get
      val leafs = SnapshotLog.dirsOf(spark, r, head)
        .map(_.split('/').last).toSet
      assert(leafs == Set("__gp=2024-03-05", "__gp=2024-03-07"),
        s"zone-pinned identity drifted: $leafs")
      // DAY PRUNING under a non-pinned (UTC) session zone: a probe
      // inside NY day 03-07 must not read the 03-05 leaf
      val day7 = sql("""SELECT id FROM graft.ns.ev
        WHERE ts >= TIMESTAMP'2024-03-07 12:00:00'
          AND ts <  TIMESTAMP'2024-03-08 00:00:00'""")
      val total = sql("SELECT * FROM graft.ns.ev")
      val totalFiles = scannedFiles(total)
      val keptFiles = scannedFiles(day7)
      assert(keptFiles < totalFiles,
        s"day pruning did not engage: $keptFiles of $totalFiles files")
      assert(day7.collect().map(_.getInt(0)).toSet == Set(3))
      assert(total.count() == 3)
    } finally spark.conf.set("spark.sql.session.timeZone", zoneBefore)
  }


  test("static PARTITION overwrite, dynamic-mode overwrite, and writeTo overwrite(cond)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    // flat table: DataFrameWriterV2 overwrite(cond) lowers to the
    // positions-based replaceWhere — versions grow, nothing rewrites
    sql("CREATE TABLE graft.ns.rwf (k INT, d STRING, v STRING)")
    sql("INSERT INTO graft.ns.rwf VALUES (1,'d1','a'), (3,'d2','c')")
    val s0 = spark; import s0.implicits._
    Seq((10, "d1", "x")).toDF("k", "d", "v")
      .writeTo("graft.ns.rwf")
      .overwrite(org.apache.spark.sql.functions.col("d") === "d1")
    assert(rowsOf("SELECT k, d, v FROM graft.ns.rwf") ==
      Set(Seq(10, "d1", "x"), Seq(3, "d2", "c")))
    // a batch row outside the predicate refuses (the Delta contract)
    val e = intercept[Exception] {
      Seq((9, "d2", "n")).toDF("k", "d", "v")
        .writeTo("graft.ns.rwf")
        .overwrite(org.apache.spark.sql.functions.col("d") === "d1")
    }
    assert(e.getMessage.contains("outside the predicate"), e.getMessage)

    // partitioned table: static PARTITION (p = v) names one partition,
    // the overwrite replaces exactly it (untouched leaf byte-identical)
    sql("CREATE TABLE graft.ns.rwp (k INT, v STRING, p STRING) " +
        "PARTITIONED BY (p)")
    sql("INSERT INTO graft.ns.rwp VALUES (1,'a','p1'), (3,'c','p2')")
    val rp = root("rwp")
    // first static overwrite migrates the flat INSERT layout into leafs
    sql("INSERT OVERWRITE graft.ns.rwp PARTITION (p = 'p1') SELECT 10, 'x'")
    assert(rowsOf("SELECT k, v, p FROM graft.ns.rwp") ==
      Set(Seq(10, "x", "p1"), Seq(3, "c", "p2")))
    def p2Files(): Map[String, Long] =
      new java.io.File(rp).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(f => f.isDirectory && f.getName == "__gp=p2")
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    val before = p2Files()
    assert(before.nonEmpty, "expected a __gp=p2 leaf after the migration")
    // second static overwrite on an all-scoped parent: p2 untouched
    sql("INSERT OVERWRITE graft.ns.rwp PARTITION (p = 'p1') SELECT 11, 'y'")
    assert(rowsOf("SELECT k, v, p FROM graft.ns.rwp") ==
      Set(Seq(11, "y", "p1"), Seq(3, "c", "p2")))
    before.foreach { case (f, m) =>
      assert(new java.io.File(f).lastModified() == m,
        s"static partition overwrite touched untouched leaf file $f")
    }
    // empty static overwrite TRUNCATES the named partition (DV delete)
    sql("INSERT OVERWRITE graft.ns.rwp PARTITION (p = 'p1') " +
        "SELECT k, v FROM graft.ns.rwp WHERE false")
    assert(rowsOf("SELECT k, v, p FROM graft.ns.rwp") ==
      Set(Seq(3, "c", "p2")))

    // dynamic mode: INSERT OVERWRITE replaces only the touched partitions
    val modeBefore = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      sql("INSERT INTO graft.ns.rwp VALUES (5,'e','p3')")
      sql("INSERT OVERWRITE graft.ns.rwp VALUES (30,'C','p2')")
      assert(rowsOf("SELECT k, v, p FROM graft.ns.rwp") ==
        Set(Seq(30, "C", "p2"), Seq(5, "e", "p3")),
        "dynamic overwrite must keep the untouched p3 partition")
    } finally {
      modeBefore match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("merge-on-read lifecycle purely through SQL (round 11c): DDL, O(batch) writes, safe DELETE, materialize") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.mor (k INT, v STRING) " +
        "TBLPROPERTIES ('graft.morKeys'='k')")
    // the declared keys surface through DESCRIBE EXTENDED / properties
    val props = sql("DESCRIBE TABLE EXTENDED graft.ns.mor").collect()
      .map(r => r.getString(0) + "=" + r.getString(1)).mkString("\n")
    assert(props.contains("graft.morKeys=k") || props.contains("morKeys"),
      s"morKeys not surfaced:\n$props")

    // INSERT INTO on a MoR lineage = O(batch) shadowing upsert (the
    // Hudi upsert-table contract): re-inserting a key replaces it
    sql("INSERT INTO graft.ns.mor VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.ns.mor VALUES (2, 'B2')")
    assert(rowsOf("SELECT k, v FROM graft.ns.mor") ==
      Set(Seq(1, "a"), Seq(2, "B2")))
    // the second insert wrote ONLY its batch (v1 = empty bootstrap)
    assert(spark.read.parquet(root("mor") + "/data_v00000003").count() == 1,
      "MoR INSERT rewrote the snapshot instead of appending O(batch)")

    // classic upsert-shaped MERGE lands as the O(batch) shadowing delta
    sql("MERGE INTO graft.ns.mor t USING (SELECT 1 AS k, 'A3' AS v) s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(rowsOf("SELECT k, v FROM graft.ns.mor") ==
      Set(Seq(1, "A3"), Seq(2, "B2")))
    assert(spark.read.parquet(root("mor") + "/data_v00000004").count() == 1,
      "classic MERGE on MoR rewrote the snapshot")

    // DELETE WHERE matches the VISIBLE row — every physical copy of
    // the key dies, the (1,'a') shadow must not resurface
    sql("DELETE FROM graft.ns.mor WHERE v = 'A3'")
    assert(rowsOf("SELECT k, v FROM graft.ns.mor") == Set(Seq(2, "B2")),
      "shadow resurrected through SQL DELETE on a MoR lineage")

    // a non-key ON has no shadowing identity — refuses with the escape
    // hatch named (the key-equality general MERGE lowers O(batch)
    // instead since round 11d; its own test below)
    val gm = intercept[Exception] {
      sql("MERGE INTO graft.ns.mor t USING (SELECT 'B2' AS v) s " +
          "ON t.v = s.v WHEN MATCHED THEN DELETE")
    }
    assert(gm.getMessage.contains("compact_chain"), gm.getMessage)
    // UPDATE lands as ONE O(matched) shadowing delta — no vector, no
    // rewrite; the new version's own dir holds only the rewritten rows
    sql("UPDATE graft.ns.mor SET v = 'U' WHERE k = 2")
    assert(rowsOf("SELECT k, v FROM graft.ns.mor") == Set(Seq(2, "U")))
    assert(spark.read.parquet(root("mor") + "/data_v00000006").count() == 1,
      "MoR UPDATE rewrote the snapshot instead of shadowing O(matched)")
    // key columns are immutable under shadowing
    val kc = intercept[Exception] {
      sql("UPDATE graft.ns.mor SET k = 9 WHERE v = 'U'")
    }
    assert(kc.getMessage.contains("shadowing identity"), kc.getMessage)

    // CALL compact_chain materializes the lineage back to flat — the
    // rewrite verbs become legal again
    val mv = sql("CALL graft.system.compact_chain('ns.mor', 1)")
      .head().getLong(0)
    assert(mv > 5L)
    sql("UPDATE graft.ns.mor SET v = 'flat' WHERE k = 2")
    assert(rowsOf("SELECT k, v FROM graft.ns.mor") == Set(Seq(2, "flat")))

    // refusal edges: morKeys + PARTITIONED BY is contradictory
    val bad = intercept[Exception] {
      sql("CREATE TABLE graft.ns.morp (k INT, p STRING) PARTITIONED BY (p) " +
          "TBLPROPERTIES ('graft.morKeys'='k')")
    }
    assert(bad.getMessage.contains("morKeys"), bad.getMessage)

    // CTAS threads TBLPROPERTIES (they were silently dropped before):
    // a morKeys CTAS bootstraps the lineage, its result is the first
    // shadowing batch, and later keyed writes stay O(batch)
    sql("CREATE TABLE graft.ns.morc TBLPROPERTIES ('graft.morKeys'='k') " +
        "AS SELECT 1 AS k, 'a' AS v")
    sql("INSERT INTO graft.ns.morc VALUES (1, 'a2')")
    assert(rowsOf("SELECT k, v FROM graft.ns.morc") == Set(Seq(1, "a2")),
      "CTAS dropped graft.morKeys — the insert appended instead of shadowing")
    assert(spark.read.parquet(root("morc") + "/data_v00000003").count() == 1)

    // CALL compact_mor folds the chain but the lineage STAYS MoR:
    // the next INSERT still shadows instead of refusing/appending
    val cv = sql("CALL graft.system.compact_mor('ns.morc', 1)")
      .head().getLong(0)
    assert(cv == 4L)
    sql("INSERT INTO graft.ns.morc VALUES (1, 'a5')")
    assert(rowsOf("SELECT k, v FROM graft.ns.morc") == Set(Seq(1, "a5")),
      "compact_mor converted the lineage — the insert stopped shadowing")
  }

  test("general multi-clause MERGE on a merge-on-read lineage (round 11d): one O(batch) shadowing commit") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.gmor (k INT, v STRING, n INT) " +
        "TBLPROPERTIES ('graft.morKeys'='k')")
    sql("INSERT INTO graft.ns.gmor VALUES " +
        "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, 'd', 40)")

    // conditional UPDATE, conditional DELETE, INSERT — first matching
    // clause wins; k=3 matches but fires NO clause (carried for free
    // under shadowing), k=4 is target-only (survives)
    sql("""MERGE INTO graft.ns.gmor t USING (
             SELECT 1 AS k, 'A' AS v UNION ALL
             SELECT 2 AS k, 'x' AS v UNION ALL
             SELECT 3 AS k, 'z' AS v UNION ALL
             SELECT 9 AS k, 'i' AS v) s
           ON t.k = s.k
           WHEN MATCHED AND t.n < 15 THEN UPDATE SET v = s.v, n = t.n + 1
           WHEN MATCHED AND s.v = 'x' THEN DELETE
           WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, 0)""")
    assert(rowsOf("SELECT k, v, n FROM graft.ns.gmor") == Set(
      Seq(1, "A", 11), Seq(3, "c", 30), Seq(4, "d", 40), Seq(9, "i", 0)))

    // the lowering is O(batch): v1 bootstrap, v2 insert, v3 merge —
    // the merge's own delta dir holds EXACTLY the update + the insert
    // (the untouched matched row k=3 is NOT rewritten; the flat
    // general MERGE would have had to carry it into new files)
    val deltaRows = spark.read.parquet(root("gmor") + "/data_v00000003")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(deltaRows == Set((1, "A"), (9, "i")),
      s"merge delta dir is not O(touched): $deltaRows")
    // the DELETE landed as a deletion vector, not a rewrite
    assert(new java.io.File(root("gmor") + "/tomb_v00000003").isDirectory,
      "general MoR MERGE delete did not produce a deletion vector")
    // pre-merge files untouched: time travel sees the old snapshot
    assert(rowsOf("SELECT k, v FROM graft.ns.gmor VERSION AS OF 2") ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c"), Seq(4, "d")))

    // the lineage STAYS merge-on-read: a later INSERT still shadows
    sql("INSERT INTO graft.ns.gmor VALUES (1, 'A2', 12)")
    assert(rowsOf("SELECT v FROM graft.ns.gmor WHERE k = 1") ==
      Set(Seq("A2")))
    // and the deleted key stays dead (its old copies never resurface),
    // but RE-INSERTING it through a merge is a true insert again
    sql("""MERGE INTO graft.ns.gmor t USING (SELECT 2 AS k, 'back' AS v) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, -1)""")
    assert(rowsOf("SELECT k, v, n FROM graft.ns.gmor WHERE k = 2") ==
      Set(Seq(2, "back", -1)), "deleted key did not re-insert cleanly")

    // `UPDATE SET *` in the general form: the key is assigned the
    // SOURCE attr the ON equates with it — accepted as identity
    sql("""MERGE INTO graft.ns.gmor t
           USING (SELECT 9 AS k, 'I2' AS v, 7 AS n) s ON t.k = s.k
           WHEN MATCHED AND s.n > 0 THEN UPDATE SET *""")
    assert(rowsOf("SELECT k, v, n FROM graft.ns.gmor WHERE k = 9") ==
      Set(Seq(9, "I2", 7)))

    // key columns stay immutable under shadowing
    val kc = intercept[Exception] {
      sql("""MERGE INTO graft.ns.gmor t USING (SELECT 9 AS k) s
             ON t.k = s.k WHEN MATCHED THEN UPDATE SET k = 99""")
    }
    assert(kc.getMessage.contains("shadowing identity"), kc.getMessage)
    // ON equality on MORE than the keys has no shadowing identity
    val sup = intercept[Exception] {
      sql("""MERGE INTO graft.ns.gmor t USING (SELECT 9 AS k, 'I2' AS v) s
             ON t.k = s.k AND t.v = s.v WHEN MATCHED THEN DELETE""")
    }
    assert(sup.getMessage.contains("compact_chain"), sup.getMessage)

    // changesBetween across the merge version reports the keyed truth:
    // update (1), delete (2), insert (9) — the untouched rows silent
    val ch = SnapshotLog.changesBetween(spark, root("gmor"), 2L, 3L,
        Seq("k")).collect()
      .map(r => (r.getAs[String]("change_type"), r.getAs[Int]("k"))).toSet
    assert(ch == Set(("update", 1), ("delete", 2), ("insert", 9)),
      s"changesBetween across the MoR merge: $ch")
  }


  test("CALL graft.system.convert_parquet adopts a raw parquet dir in place (round 12)") {
    // a raw parquet dump landed directly in the warehouse layout
    val r = root("rawdump")
    spark.range(0, 100).selectExpr("id AS k", "concat('w', id) AS v")
      .coalesce(2).write.parquet(r)
    val out = sql("CALL graft.system.convert_parquet('ns.rawdump', 'k')").head()
    assert(out.getString(0) == r && out.getLong(1) == 1L)
    // the converted table is immediately a first-class catalog table
    assert(sql("SELECT count(*) FROM graft.ns.rawdump").head().getLong(0) == 100L)
    sql("INSERT INTO graft.ns.rawdump VALUES (100, 'w100')")
    assert(sql("SELECT count(*) FROM graft.ns.rawdump").head().getLong(0) == 101L)
    assert(rowsOf("SELECT v FROM graft.ns.rawdump WHERE k = 100") == Set(Seq("w100")))
    // time travel back to the adopted snapshot
    assert(sql("SELECT count(*) FROM graft.ns.rawdump VERSION AS OF 1")
      .head().getLong(0) == 100L)
    // maintenance surface applies (both commits in history)
    assert(sql("CALL graft.system.history('ns.rawdump')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("metadata-only aggregates: count/min/max answer from the sidecar, bail when inexact (round 12)") {
    sql("""CREATE TABLE graft.ns.meta (k INT, v STRING)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    sql("INSERT INTO graft.ns.meta VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.ns.meta VALUES (3, NULL)")

    def isMetaOnly(q: String): Boolean = {
      val plan = sql(q).queryExecution.executedPlan
      plan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // answered from the manifest: the WHOLE plan is a local scan
    assert(isMetaOnly("SELECT count(*) FROM graft.ns.meta"))
    assert(sql("SELECT count(*) FROM graft.ns.meta").head().getLong(0) == 3L)
    assert(sql("SELECT count(*) AS c, count(k) AS ck, min(k) AS lo, max(k) AS hi FROM graft.ns.meta")
      .head().toSeq == Seq(3L, 3L, 1, 3))
    assert(isMetaOnly("SELECT min(k), max(k) FROM graft.ns.meta"))
    // time travel answers the asked version (v1 = the empty CREATE
    // commit — answered 0 from metadata; v2 = the first INSERT)
    assert(isMetaOnly("SELECT count(*) FROM graft.ns.meta VERSION AS OF 1"))
    assert(sql("SELECT count(*) FROM graft.ns.meta VERSION AS OF 1")
      .head().getLong(0) == 0L)
    assert(sql("SELECT count(*) FROM graft.ns.meta VERSION AS OF 2")
      .head().getLong(0) == 2L)
    // a WHERE clause scans (and is right)
    assert(!isMetaOnly("SELECT count(*) FROM graft.ns.meta WHERE k > 1"))
    assert(sql("SELECT count(*) FROM graft.ns.meta WHERE k > 1").head().getLong(0) == 2L)
    // count(v): v has no stats coverage → scan, right answer (one NULL)
    assert(!isMetaOnly("SELECT count(v) FROM graft.ns.meta"))
    assert(sql("SELECT count(v) FROM graft.ns.meta").head().getLong(0) == 2L)
    // a DV delete makes file rows ≠ visible rows → scan, right answer
    sql("DELETE FROM graft.ns.meta WHERE k = 2")
    assert(!isMetaOnly("SELECT count(*) FROM graft.ns.meta"))
    assert(sql("SELECT count(*) FROM graft.ns.meta").head().getLong(0) == 2L)
    // escape hatch
    sql("SET graft.metaAggregates.enabled=false")
    try assert(!isMetaOnly("SELECT count(*) FROM graft.ns.meta VERSION AS OF 2"))
    finally sql("SET graft.metaAggregates.enabled=true")
  }

  test("GROUP BY partition column answers from per-leaf metadata (round 12)") {
    sql("""CREATE TABLE graft.ns.gmeta (k INT, p STRING, n INT)
           PARTITIONED BY (p) TBLPROPERTIES ('graft.statsCols'='n')""")
    val s0 = spark; import s0.implicits._
    Seq((1, "a", 10), (2, "a", 20), (3, "b", 30))
      .toDF("k", "p", "n").createOrReplaceTempView("gm_src")
    sql("""MERGE INTO graft.ns.gmeta t USING gm_src s ON t.k = s.k AND t.p = s.p
           WHEN MATCHED THEN UPDATE SET k = s.k, p = s.p, n = s.n
           WHEN NOT MATCHED THEN INSERT (k, p, n) VALUES (s.k, s.p, s.n)""")
    def isMetaOnly(q: String): Boolean =
      sql(q).queryExecution.executedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    val q = """SELECT p, count(*) AS c, count(n) AS cn, min(n) AS lo,
               max(n) AS hi, max(p) AS mp FROM graft.ns.gmeta GROUP BY p"""
    assert(isMetaOnly(q), "per-leaf metadata grouping did not engage")
    assert(rowsOf(q) == Set(Seq("a", 2L, 2L, 10, 20, "a"),
                            Seq("b", 1L, 1L, 30, 30, "b")))
    // scoped upsert touching one leaf keeps per-leaf answers exact
    Seq((2, "a", 25), (4, "c", 40)).toDF("k", "p", "n")
      .createOrReplaceTempView("gm_src2")
    sql("""MERGE INTO graft.ns.gmeta t USING gm_src2 s ON t.k = s.k AND t.p = s.p
           WHEN MATCHED THEN UPDATE SET k = s.k, p = s.p, n = s.n
           WHEN NOT MATCHED THEN INSERT (k, p, n) VALUES (s.k, s.p, s.n)""")
    assert(isMetaOnly(q))
    assert(rowsOf(q) == Set(Seq("a", 2L, 2L, 10, 25, "a"),
                            Seq("b", 1L, 1L, 30, 30, "b"),
                            Seq("c", 1L, 1L, 40, 40, "c")))
    // GROUP BY a non-partition column scans (and is right)
    assert(!isMetaOnly("SELECT k, count(*) FROM graft.ns.gmeta GROUP BY k"))
    assert(sql("SELECT k, count(*) FROM graft.ns.gmeta GROUP BY k").count() == 4)
    // a WHERE clause scans (and is right)
    val w = "SELECT p, count(*) FROM graft.ns.gmeta WHERE n > 20 GROUP BY p"
    assert(!isMetaOnly(w))
    assert(rowsOf(w) == Set(Seq("a", 1L), Seq("b", 1L), Seq("c", 1L)))
  }

  test("reader-option time travel: spark.read.option(versionAsOf).table (round 12)") {
    sql("""CREATE TABLE graft.ns.tt (k INT, v STRING)
           TBLPROPERTIES ('graft.statsCols'='k')""")
    sql("INSERT INTO graft.ns.tt VALUES (1, 'a')")
    sql("INSERT INTO graft.ns.tt VALUES (2, 'b')")
    // v2 = first insert, v3 = head
    assert(spark.read.option("versionAsOf", 2).table("graft.ns.tt")
      .collect().map(_.getInt(0)).toSet == Set(1))
    assert(spark.read.table("graft.ns.tt").count() == 2)
    // version pinning holds through later DataFrame ops (the relation
    // expanded at .table() time — DataFrame-API aggregates therefore
    // take the scan plan; SQL-text aggregates keep the metadata answer)
    val df = spark.read.option("versionAsOf", 2).table("graft.ns.tt")
      .groupBy().count()
    assert(df.head().getLong(0) == 1L)
    // timestampAsOf far future = head; conflicting options refuse
    assert(spark.read.option("timestampAsOf", "2999-01-01")
      .table("graft.ns.tt").count() == 2)
    // Spark's RelationResolution refuses the conflicting pair natively
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.option("versionAsOf", 2)
        .option("timestampAsOf", "2999-01-01").table("graft.ns.tt").collect()
    }
  }

  test("ann_near_dup TVF: index-amortized near-dup pairs through SQL (round 14)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("CREATE TABLE graft.ns.embnd (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    // four tight clusters around the axes: near-dups live inside a
    // cluster; cross-cluster cosines are far below the threshold
    sql("""INSERT INTO graft.ns.embnd
           SELECT id AS vec_id,
                  transform(sequence(0, 7), d ->
                    cast(if(d = id % 4, 1.0, 0.001 * pmod(id + d, 5)) AS FLOAT))
                    AS embedding
           FROM range(40)""")
    sql("CALL graft.system.ann_build('ns.embnd', 'vec_id', 'embedding', 4)")
    val pairs = sql("SELECT * FROM ann_near_dup('graft.ns.embnd', 0.999)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "no near-dup pairs found")
    // every pair is same-cluster (id % 4 equal) and canonicalized
    assert(pairs.forall { case (a, b) => a < b && a % 4 == b % 4 },
      pairs.toString)
    // an ivfpq index DISPATCHES to the SDC candidate path (r16): same
    // pairs (the exact verify is shared), margin as the optional 4th arg
    graft.engine.AnnIndex.buildPq(spark, root("embnd"), "ivfpq",
      kCells = 4, m = 4, kPq = 256)
    val viaPq = sql(
      "SELECT * FROM ann_near_dup('graft.ns.embnd', 0.999, 'ivfpq', 0.1)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPq == pairs, s"SDC dispatch diverged: $viaPq != $pairs")
    // margin on a float index is refused
    val eM = intercept[Exception] {
      sql("SELECT * FROM ann_near_dup('graft.ns.embnd', 0.999, 'ivf', 0.1)")
        .collect()
    }
    assert(eM.getMessage.contains("margin"), eM.getMessage)
    // staleness refuses through SQL too
    sql("INSERT INTO graft.ns.embnd VALUES (999, array(" +
      (0 until 8).map(d => s"cast(${if (d == 0) 1.0 else 0.0} as float)")
        .mkString(",") + "))")
    val e = intercept[Exception] {
      sql("SELECT * FROM ann_near_dup('graft.ns.embnd', 0.999)").collect()
    }
    assert(e.getMessage.contains("refresh"), e.getMessage)
  }

  test("register_view / refresh_all: the derived surface converges through SQL (round 14)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    sql("""CREATE TABLE graft.ns.rfacts
           (id BIGINT, grp STRING, amt DOUBLE, embedding ARRAY<FLOAT>)""")
    sql("""INSERT INTO graft.ns.rfacts
           SELECT id, concat('g', id % 3) AS grp, CAST(id % 50 AS DOUBLE) AS amt,
                  transform(sequence(0, 7), d ->
                    cast(if(d = id % 4, 1.0, 0.02 * pmod(id + d, 7)) AS FLOAT))
                    AS embedding
           FROM range(60)""")
    sql("CALL graft.system.ann_build('ns.rfacts', 'id', 'embedding', 4)")
    sql("""CALL graft.system.register_view('ns.rfacts', 'by_grp',
           'ns.rfacts_mv', 'grp', 'amt', 'id', false, '', 'mv_rfacts')""")
    val reg = sql("CALL graft.system.registered_views('ns.rfacts')")
      .collect()
    assert(reg.length == 1 && reg.head.getString(0) == "by_grp" &&
      reg.head.getString(4) == "id", reg.mkString(","))
    def expectRows = sql(
      """SELECT grp, count(*) AS n_rows,
                CAST(sum(coalesce(amt, 0)) AS DECIMAL(38,6)) AS sum_amt
         FROM graft.ns.rfacts GROUP BY grp""")
      .collect().map(_.toSeq.map(Option(_))).toSet
    def mvRows = sql("SELECT grp, n_rows, sum_amt FROM graft.ns.rfacts_mv")
      .collect().map(_.toSeq.map(Option(_))).toSet
    // ONE verb bootstraps the view and keeps the index fresh
    val a1 = sql("CALL graft.system.refresh_all('ns.rfacts')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a1.keySet == Set("view:by_grp", "ann:ivf"), a1.toString)
    assert(mvRows == expectRows)
    // churn every way, then converge everything again
    sql("INSERT INTO graft.ns.rfacts VALUES " +
      "(1000, 'g0', 9.0, array(cast(2.0 as float), cast(0.0 as float), " +
      "cast(0.0 as float), cast(0.0 as float), cast(0.0 as float), " +
      "cast(0.0 as float), cast(0.0 as float), cast(0.0 as float)))")
    sql("UPDATE graft.ns.rfacts SET grp = 'g9' WHERE id = 1")
    sql("DELETE FROM graft.ns.rfacts WHERE id = 2")
    val head = SnapshotLog.currentVersion(spark, root("rfacts")).get
    val a2 = sql("CALL graft.system.refresh_all('ns.rfacts')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a2 == Map("view:by_grp" -> head, "ann:ivf" -> head), a2.toString)
    assert(mvRows == expectRows)
    val stale = sql("CALL graft.system.ann_indexes('ns.rfacts')")
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(stale == Map("ivf" -> false), stale.toString)
    // unregister: the verb keeps converging what remains
    sql("CALL graft.system.unregister_view('ns.rfacts', 'by_grp')")
    assert(sql("CALL graft.system.registered_views('ns.rfacts')")
      .collect().isEmpty)
    val a3 = sql("CALL graft.system.refresh_all('ns.rfacts')").collect()
      .map(_.getString(0)).toSet
    assert(a3 == Set("ann:ivf"), a3.toString)
  }
}
