package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Full-rebuild orchestration — the reference's `update_db` flow (SURVEY
  * §3.1.1) re-expressed: select the latest dated generation per input,
  * ingest + coerce with per-table rules, build tables in dependency order
  * (dimensions before facts), run referential-integrity checks, and write
  * the snapshot only if the build is clean.
  *
  * Where the reference crosses a process boundary per builder script and a
  * client/server boundary per INSERT, this is one Spark application: each
  * table build is a lazy DataFrame, integrity checks are anti-joins, and
  * the only materialization is the final snapshot write. At 100 TB the
  * same orchestration runs unchanged — each table's write parallelizes
  * across the cluster and the checks are ordinary joins.
  */
object Rebuild {

  /** One input table: dated-file pattern, explicit schema, cleaning rules,
    * and the foreign keys that must resolve against previously built
    * tables (dependency order = list order in the plan).
    */
  final case class TableSpec(
      name: String,
      filePattern: String,                    // regex with date capture group
      schema: StructType,
      rules: Seq[Coerce.Rule] = Nil,
      naturalKey: Seq[String] = Nil,          // dedup key (last wins not needed: inputs are snapshots)
      foreignKeys: Seq[(String, String, String)] = Nil) // (localCol, refTable, refCol)

  final case class BuildReport(
      table: String,
      rowsIn: Long,
      rowsOut: Long,
      badRows: Long,
      dupRows: Long,
      fkViolations: Map[String, Long])

  /** Run the rebuild. Returns per-table reports; writes `outDir/<table>`
    * parquet for every table ONLY if no integrity violations anywhere
    * (all-or-nothing, like the reference's transactional rebuild).
    * Throws if any input generation is missing.
    */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          plan: Seq[TableSpec]): Seq[BuildReport] = {
    // 1. generation check: every input must have a dated file present
    val picked: Map[String, String] = plan.map { t =>
      val f = Sources.latestGeneration(spark, inputDir, t.filePattern)
        .getOrElse(throw new IllegalStateException(
          s"rebuild aborted: no input generation matches ${t.filePattern}"))
      t.name -> f
    }.toMap

    // 2. build in dependency order, collecting reports. Each table's
    // deduped frame is persisted: it is re-used by its own counts, every
    // later table's FK check, and the final write — without the persist
    // the CSV read + coercion would recompute per action.
    var built = Map.empty[String, DataFrame]
    val reports = plan.map { t =>
      val raw = Sources.readCsv(spark, picked(t.name), allStrings(t.schema))
      val rowsIn = raw.count()
      val (typed, bad) = Coerce.coerceWithAudit(raw, coercionRules(t))
      val deduped =
        (if (t.naturalKey.nonEmpty)
          typed.dropDuplicates(t.naturalKey)   // reference's dedup-by-natural-key
        else typed).persist()
      val nBad = bad.count()
      val nOut = deduped.count()
      val fkViolations = t.foreignKeys.map { case (local, refTable, refCol) =>
        val ref = built.getOrElse(refTable, sys.error(
          s"plan error: ${t.name} references $refTable before it is built"))
        // standard FK semantics: a NULL foreign key is not a violation
        val orphans = deduped
          .filter(col(local).isNotNull)
          .join(ref.select(col(refCol).as("__ref")), col(local) === col("__ref"), "left_anti")
          .count()
        s"$local->$refTable.$refCol" -> orphans
      }.toMap
      built += t.name -> deduped
      BuildReport(t.name, rowsIn, nOut, nBad, rowsIn - nBad - nOut, fkViolations)
    }

    // 3. all-or-nothing snapshot write
    val clean = reports.forall(r => r.fkViolations.values.forall(_ == 0L))
    if (clean) {
      plan.foreach(t => built(t.name).write.mode("overwrite").parquet(s"$outDir/${t.name}"))
    }
    plan.foreach(t => built(t.name).unpersist())
    reports
  }

  /** CSV arrives all-strings; the typed schema drives coercion rules. */
  private def allStrings(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(dataType = org.apache.spark.sql.types.StringType)))

  private def coercionRules(t: TableSpec): Seq[Coerce.Rule] = {
    val explicit = t.rules.map(r => r.column -> r).toMap
    t.schema.fields.toSeq.map { f =>
      explicit.getOrElse(f.name,
        Coerce.Rule(f.name, Seq(Coerce.Trim), f.dataType.catalogString))
    }
  }
}
