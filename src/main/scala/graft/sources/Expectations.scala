package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Commit-time data-quality expectations (the CHECK-constraint /
  * quality-gate surface every curated ingest pipeline needs): named
  * predicates attached to a commit, each with a policy —
  *
  *   - [[Expectations.warn]]: keep violating rows, count them
  *   - [[Expectations.drop]]: remove violating rows, count them
  *   - [[Expectations.fail]]: abort the whole commit on the first
  *     violating row (checked on rows that survive drops)
  *
  * The 100 TB point is WHERE the counting happens: violation counts are
  * `observe()` aggregates folded per-task DURING the commit's own write
  * scan — rows flow through once, no validate-then-write double pass,
  * no second audit scan after the fact (`Observed` has the single-scan
  * proof). Fail policy compiles to a per-row `assert_true` filter, so a
  * bad batch dies inside the write job BEFORE the manifest publishes:
  * the staged debris is recovered by the next writer (the torn-commit
  * contract) and the table's current version never moves.
  *
  * A row PASSES a predicate only when it evaluates to exactly TRUE —
  * NULL counts as a violation (pipeline-gate semantics: unknown data is
  * bad data), unlike SQL CHECK where NULL passes. Wrap a predicate in
  * `coalesce(p, lit(true))` to opt into CHECK's laxness per-expectation.
  *
  * Each checked commit persists its counts as a per-version AUDIT file
  * next to the manifest (the DLT-event-log shape): [[Expectations.audit]]
  * reads a version's record back; vacuum of the version removes it with
  * the manifest. The audit is observability metadata, written after the
  * pointer swap — a crash between the two loses the audit line, never
  * the committed data.
  */
object Expectations {

  sealed trait Policy
  case object WarnPolicy extends Policy
  case object DropPolicy extends Policy
  case object FailPolicy extends Policy

  final case class Expectation(name: String, predicate: Column, policy: Policy) {
    require(name.nonEmpty && !name.contains("\t") && !name.contains("\n"),
      s"expectation name must be a simple label, got '$name'")
  }

  def warn(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, WarnPolicy)
  def drop(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, DropPolicy)
  def fail(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, FailPolicy)

  private def passes(p: Column): Column = coalesce(p, lit(false))

  /** Gate `df` with `exps`: returns the policy-filtered frame plus the
    * Observation whose row (available after the first action) carries
    * `rows_in` and one violation count per expectation. Composable with
    * ANY sink — the SnapshotLog entry points below are the packaged
    * paths.
    */
  def gate(df: DataFrame, exps: Seq[Expectation]): (DataFrame, Observation) = {
    require(exps.nonEmpty, "pass at least one expectation")
    require(exps.map(_.name).distinct.size == exps.size,
      s"expectation names must be unique: ${exps.map(_.name)}")
    require(!exps.exists(_.name == "rows_in"), "'rows_in' is reserved")
    val obs = Observation()
    val metrics =
      count(lit(1)).as("rows_in") +:
      exps.map(e => sum(when(passes(e.predicate), 0L).otherwise(1L)).as(e.name))
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    // drops first, then fail-asserts on the survivors: CombineFilters
    // keeps the inner (earlier) conjuncts first and And short-circuits,
    // and neither filter pushes through CollectMetrics — counts always
    // reflect the FULL incoming batch
    val dropped = exps.filter(_.policy == DropPolicy)
      .foldLeft(observed)((d, e) => d.filter(passes(e.predicate)))
    val checked = exps.filter(_.policy == FailPolicy)
      .foldLeft(dropped)((d, e) => d.filter(
        assert_true(passes(e.predicate),
          lit(s"expectation '${e.name}' violated")).isNull))
    (checked, obs)
  }

  /** Full-snapshot checked commit: gate, commit, persist the audit.
    * Returns (version, per-metric counts). A fail-policy violation
    * aborts with the table untouched.
    */
  def commitChecked(spark: SparkSession, root: String, df: DataFrame,
                    exps: Seq[Expectation],
                    statsCols: Seq[String] = Nil,
                    bloomCols: Seq[String] = Nil): (Long, Map[String, Long]) = {
    val (gated, obs) = gate(df, exps)
    val v = SnapshotLog.commit(spark, root, gated, statsCols, bloomCols)
    val counts = countsOf(obs)
    writeAudit(spark, root, v, counts)
    (v, counts)
  }

  /** O(batch) checked append ([[SnapshotLog.appendCommit]] semantics):
    * the quality gate costs nothing beyond the delta write it rides.
    */
  def appendChecked(spark: SparkSession, root: String, df: DataFrame,
                    exps: Seq[Expectation],
                    statsCols: Seq[String] = Nil,
                    bloomCols: Seq[String] = Nil): (Long, Map[String, Long]) = {
    val (gated, obs) = gate(df, exps)
    val v = SnapshotLog.appendCommit(spark, root, gated, statsCols, bloomCols)
    val counts = countsOf(obs)
    writeAudit(spark, root, v, counts)
    (v, counts)
  }

  /** sum() over a zero-row batch observes SQL NULL, not 0 — an empty
    * daily load must still audit cleanly (the commit has already
    * published by the time we read the metrics, so throwing here would
    * report failure for a commit that landed).
    */
  private[sources] def countsOf(obs: Observation): Map[String, Long] =
    obs.get.map { case (k, v) =>
      k -> (v match {
        case null      => 0L
        case n: Number => n.longValue
      })
    }

  // ---------------------------------------------------------- audit log

  private[sources] def auditPath(root: String, v: Long): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"),
      f"v$v%08d.audit")

  /** TSV name\tcount lines, temp + atomic-overwrite rename. A version
    * can be audited TWICE — the in-log constraint gate (round 11)
    * writes its record inside commit()/appendCommit(), and an
    * [[appendChecked]]/[[commitChecked]] caller layering its own
    * expectations on the same table then audits the same version — so
    * the records MERGE instead of clobbering (second writer's counts
    * win per-name; names are disjoint between the two gates except the
    * shared `rows_in`).
    */
  private[sources] def writeAudit(spark: SparkSession, root: String, v: Long,
                         counts: Map[String, Long]): Unit = {
    val p = auditPath(root, v)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged = audit(spark, root, v).getOrElse(Map.empty) ++ counts
    val tmp = new Path(p.getParent, f".tmp_audit_v$v%08d")
    val out = f.create(tmp, true)
    try out.write(merged.toSeq.sortBy(_._1)
      .map { case (k, n) => s"$k\t$n" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** A version's audit record (None for unchecked or vacuumed versions). */
  def audit(spark: SparkSession, root: String,
            v: Long): Option[Map[String, Long]] = {
    val p = auditPath(root, v)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(text.split("\n").filter(_.nonEmpty).map { l =>
        val Array(k, n) = l.split("\t", 2); k -> n.toLong
      }.toMap)
    }
  }
}
