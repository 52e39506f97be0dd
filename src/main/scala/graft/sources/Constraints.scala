package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit}

/** PERSISTENT table-level CHECK constraints (round 10 — the SQL
  * surface for the commit-time quality gate): named predicates stored
  * once per table in `_graft_log/CONSTRAINTS` and enforced by EVERY
  * SQL DML commit path through [[Expectations.gate]] — the counting
  * rides the commit's own write scan (`observe()` aggregates, no
  * second validation pass) and each checked commit persists its
  * violation counts as the version's audit record.
  *
  * Policies (the DLT expectation ladder):
  *   - `FAIL` — ANSI CHECK behavior: a violating row aborts the whole
  *     commit before the manifest publishes; the table never moves.
  *     This is what `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)`
  *     declares.
  *   - `DROP` — violating rows are removed from the batch, counted in
  *     the audit (`CALL graft.system.add_constraint(t, n, e, 'DROP')`).
  *   - `WARN` — violating rows land, counted in the audit.
  *
  * NULL semantics follow ANSI CHECK: a predicate evaluating to NULL
  * PASSES (`coalesce(p, true)`), unlike the strict Scala-side
  * [[Expectations]] where unknown data is bad data — SQL users get the
  * standard they expect, pipeline authors keep the strict gate.
  *
  * Scale: the constraint file is O(constraints) metadata read once per
  * DML statement; enforcement is per-task fold during the write —
  * nothing extra is scanned at 100 TB.
  */
object Constraints {

  final case class TableCheck(name: String, policy: String, sql: String)

  private val Policies = Set("FAIL", "DROP", "WARN")

  private def path(root: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"), "CONSTRAINTS")

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def list(spark: SparkSession, root: String): Seq[TableCheck] = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").filter(_.nonEmpty).toSeq.map { l =>
        val Array(n, pol, sql) = l.split("\t", 3)
        TableCheck(dec(n), dec(pol), dec(sql))
      }
    }
  }

  private def write(spark: SparkSession, root: String,
                    cs: Seq[TableCheck]): Unit = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cs.isEmpty) { f.delete(p, false); return }
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, ".tmp_constraints")
    val out = f.create(tmp, true)
    try out.write(cs.map(c =>
      s"${enc(c.name)}\t${enc(c.policy)}\t${enc(c.sql)}").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Add a named CHECK: the expression must parse AND resolve against
    * the table's current schema, and the name must be fresh. FAIL-policy
    * adds additionally VALIDATE the table's EXISTING rows (the Delta
    * ADD CONSTRAINT contract): a table already holding violations is
    * refused with the count — otherwise the first unrelated DML through
    * the full-rewrite paths would abort on rows the constraint never
    * gated in. WARN/DROP adds skip the scan by design: those policies
    * tolerate (count / filter) violations rather than forbidding them.
    *
    * The edit runs under the table's writer claim (round 11): two
    * concurrent ADDs serialize instead of losing one through the
    * read-modify-write, and the validation scan cannot race a commit
    * that inserts a violating row between scan and publish.
    */
  def add(spark: SparkSession, root: String, name: String,
          sqlExpr: String, policy: String = "FAIL"): Unit = {
    val pol = policy.toUpperCase
    require(Policies.contains(pol),
      s"constraint policy must be one of $Policies, got '$policy'")
    require(name.nonEmpty && !name.contains("\t") && !name.contains("\n"),
      s"constraint name must be a simple label, got '$name'")
    SnapshotLog.read(spark, root).filter(expr(sqlExpr)).queryExecution.analyzed
    // the FAIL validation scan runs with NO lock held (the claim is for
    // metadata-side critical sections, not table scans — a minutes-long
    // scan under the claim would crash every concurrent writer); the
    // claimed section then only re-checks that the scanned version is
    // still the head, retrying the scan when a commit interleaved
    var attempts = 0
    while (true) {
      val v0 = SnapshotLog.currentVersion(spark, root)
      if (pol == "FAIL") {
        // ANSI NULL-passes: only definite FALSE rows violate
        val snap = v0.map(SnapshotLog.readVersion(spark, root, _))
          .getOrElse(SnapshotLog.read(spark, root))
        val bad = snap.filter(!coalesce(expr(sqlExpr), lit(true))).count()
        require(bad == 0L,
          s"cannot add FAIL constraint '$name' CHECK ($sqlExpr): $bad " +
          s"existing row(s) violate it — clean the data first, or declare " +
          "it WARN/DROP")
      }
      val landed = SnapshotLog.withClaimWait(spark, root) {
        if (pol == "FAIL" &&
            SnapshotLog.currentVersion(spark, root) != v0) false
        else {
          val cur = list(spark, root)
          require(!cur.exists(_.name == name),
            s"constraint '$name' already exists on $root")
          write(spark, root, cur :+ TableCheck(name, pol, sqlExpr))
          true
        }
      }
      if (landed) return
      attempts += 1
      require(attempts < 5,
        s"ADD CONSTRAINT '$name': the table kept moving during " +
        "validation — quiesce writers and retry")
    }
  }

  def drop(spark: SparkSession, root: String, name: String,
           ifExists: Boolean = false): Unit =
    SnapshotLog.withClaimWait(spark, root) {
      val cur = list(spark, root)
      if (!cur.exists(_.name == name)) {
        require(ifExists, s"no constraint '$name' on $root")
      } else write(spark, root, cur.filterNot(_.name == name))
    }

  private def toExpectation(c: TableCheck): Expectations.Expectation = {
    // ANSI CHECK: NULL passes
    val p = coalesce(expr(c.sql), lit(true))
    c.policy match {
      case "FAIL" => Expectations.fail(c.name, p)
      case "DROP" => Expectations.drop(c.name, p)
      case _      => Expectations.warn(c.name, p)
    }
  }

  /** Gate a DML batch through the table's constraints (no-op when none
    * are declared). The Observation's counts become the committed
    * version's audit record via [[finish]].
    */
  def gate(spark: SparkSession, root: String,
           df: DataFrame): (DataFrame, Option[Observation]) = {
    // identity assignment first (round 12: reserved dense ids when the
    // batch omits the column), then generated columns (computed-if-
    // absent so the constraints below can reference them; validated-
    // if-present as FAIL expectations riding the same write scan)
    val df1 = Identity.weave(spark, root, df)
    val (df2raw, genExps) = Generated.weave(spark, root, df1)
    val df2 =
      if (df2raw.ne(df1) || df1.ne(df))
        Generated.reorderToTable(spark, root, df2raw)
      else df2raw
    val exps = list(spark, root).map(toExpectation) ++ genExps
    if (exps.isEmpty) (df2, None)
    else {
      val (g, o) = Expectations.gate(df2, exps)
      (g, Some(o))
    }
  }

  /** Gate ONLY the rows a rewrite actually WROTE (round 11): full-
    * snapshot MERGE/UPDATE rewrites carry every untouched target row
    * through the commit, and gating those would let a DROP constraint
    * silently delete pre-existing rows (or a FAIL constraint abort
    * unrelated DML because of them) — CHECK constraints bind writes,
    * not carried bytes. `marker` names a non-null boolean column that
    * is true exactly on action-written rows; each predicate becomes
    * `NOT marker OR check`, so carried rows always pass and are never
    * filtered, and the audit counts only written violations. The
    * marker column is dropped from the gated frame.
    */
  def gateWritten(spark: SparkSession, root: String, df: DataFrame,
                  marker: String): (DataFrame, Option[Observation]) = {
    // a rewrite's frame always carries the table schema, so generated
    // columns are never computed here — they validate on WRITTEN rows
    // only (carried bytes were gated by the commit that wrote them)
    val (df2, genExps) = Generated.weave(spark, root, df)
    val all = list(spark, root).map(toExpectation) ++ genExps
    if (all.isEmpty) (df2.drop(marker), None)
    else {
      // ONE policy/NULL-semantics ladder (toExpectation); the marker
      // exemption only wraps the predicate
      val exps = all.map(e => e.copy(predicate =
        !org.apache.spark.sql.functions.col(marker) || e.predicate))
      val (g, o) = Expectations.gate(df2, exps)
      (g.drop(marker), Some(o))
    }
  }

  /** Content fingerprint of the CONSTRAINTS file ("" when absent) — the
    * OCC staging paths capture it at gate time and their publish
    * sections compare under the claim, so a constraint added while a
    * lock-free stage was in flight aborts the publish instead of
    * letting ungated rows land (round 11 review hardening).
    */
  def fingerprint(spark: SparkSession, root: String): String = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cBytes =
      if (!f.exists(p)) Array.emptyByteArray
      else {
        val in = f.open(p)
        try in.readAllBytes() finally in.close()
      }
    // generated-column and identity DECLARATIONS gate commits too
    // (round 12) — fold them in so a declaration added mid-stage aborts
    // the publish. The identity MARK is deliberately excluded: it moves
    // on every reservation, and reservations are already atomic — a
    // mark-moved abort would needlessly serialize concurrent stagers.
    val gBytes = Generated.rawBytes(spark, root)
    val iBytes = Identity.rawBytes(spark, root)
    if (cBytes.isEmpty && gBytes.isEmpty && iBytes.isEmpty) ""
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(cBytes)
      md.update(Array[Byte](0))
      md.update(gBytes)
      md.update(Array[Byte](0))
      md.update(iBytes)
      md.digest().map("%02x".format(_)).mkString
    }
  }

  /** Persist the gated commit's audit record (observability metadata —
    * written after the pointer swap, same contract as [[Expectations]]).
    */
  def finish(spark: SparkSession, root: String, v: Long,
             obs: Option[Observation]): Unit =
    obs.foreach(o =>
      Expectations.writeAudit(spark, root, v, Expectations.countsOf(o)))
}
