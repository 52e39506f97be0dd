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

    // 2. build in dependency order, collecting reports. raw (the CSV
    // parse) and deduped are persisted: between them they serve every
    // count, FK check and the final write with one scan + one coercion
    // pass per table instead of one per action.
    var built = Map.empty[String, DataFrame]
    var persisted = List.empty[DataFrame]
    try {
      val reports = plan.map { t =>
        val raw = Sources.readCsv(spark, picked(t.name), allStrings(t.schema)).persist()
        persisted ::= raw
        val rowsIn = raw.count()
        val (typed, bad) = Coerce.coerceWithAudit(raw, coercionRules(t))
        val deduped =
          (if (t.naturalKey.nonEmpty)
            typed.dropDuplicates(t.naturalKey)   // reference's dedup-by-natural-key
          else typed).persist()
        persisted ::= deduped
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

      // 3. all-or-nothing snapshot: stage every table, then swap the whole
      // directory — a mid-write failure never destroys the previous
      // consistent snapshot (overwriting tables in place would).
      val clean = reports.forall(r => r.fkViolations.values.forall(_ == 0L))
      if (clean) {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(outDir)
        val staging = new org.apache.hadoop.fs.Path(outDir + "_staging")
        val bak = new org.apache.hadoop.fs.Path(outDir + "_bak")
        fs.delete(staging, true)
        plan.foreach(t =>
          built(t.name).write.mode("overwrite").parquet(s"${staging.toString}/${t.name}"))
        def mustRename(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Unit =
          require(fs.rename(a, b), s"rename $a -> $b failed")
        fs.delete(bak, true)
        if (fs.exists(dst)) mustRename(dst, bak)
        mustRename(staging, dst)
        fs.delete(bak, true)
      }
      reports
    } finally persisted.foreach(_.unpersist())
  }

  /** CSV arrives all-strings; the typed schema drives coercion rules. */
  private def allStrings(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(dataType = org.apache.spark.sql.types.StringType)))

  private def coercionRules(t: TableSpec): Seq[Coerce.Rule] = {
    val unknown = t.rules.map(_.column).filterNot(t.schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"table ${t.name}: coercion rules reference unknown columns $unknown")
    val explicit = t.rules.map(r => r.column -> r).toMap
    t.schema.fields.toSeq.map { f =>
      explicit.getOrElse(f.name,
        Coerce.Rule(f.name, Seq(Coerce.Trim), f.dataType.catalogString))
    }
  }
}
