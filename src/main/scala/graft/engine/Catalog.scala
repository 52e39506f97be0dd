package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Downstream-consumption surface (SURVEY §3.1.3): the reference's users
  * run ad-hoc SQL against the built catalog; here that is temp views over
  * the fixture tables plus the engine's registered functions, so
  * `spark.sql("SELECT ... FROM lineitem ...")` works immediately.
  *
  * Statistics: [[analyze]] is the ANALYZE TABLE surface — it writes
  * table-level (row count, size) and column-level stats into the session
  * catalog for a managed table. Join planning consumes the size stat for
  * broadcast decisions in place of the raw-file-size fallback, so a
  * compacted/compressed table still broadcasts when its true size fits
  * (CatalogSpec proves the stats land and an unhinted join against an
  * analyzed dim broadcasts). Full CBO (cost-based join reordering) stays
  * OFF per SURVEY §4.2 — stats inform sizing, not plan-space search.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view (events goes through the
    * nanosecond-timestamp normalization in Tables) and install the native
    * vector functions. Idempotent.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.VectorFunctions.register(spark)
    tableNames.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
  }

  /** Materialize one fixture table as a managed parquet table and compute
    * table + column statistics (ANALYZE TABLE … FOR ALL COLUMNS). Returns
    * (rowCount, sizeInBytes) as recorded in the catalog. Idempotent —
    * re-running refreshes both the data and the stats.
    */
  def analyze(spark: SparkSession, sfDir: String, name: String,
              suffix: String = "_t"): (BigInt, BigInt) = {
    val tbl = name + suffix
    load(spark, sfDir, name)
      .write.mode("overwrite").format("parquet").saveAsTable(tbl)
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    val stats = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      .stats.getOrElse(throw new IllegalStateException(
        s"ANALYZE left no stats on $tbl"))
    (stats.rowCount.getOrElse(BigInt(-1)), stats.sizeInBytes)
  }

  /** Load one table by name through the schema-aware loaders. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "region"     => Tables.region(spark, sfDir)
    case "nation"     => Tables.nation(spark, sfDir)
    case "customer"   => Tables.customer(spark, sfDir)
    case "supplier"   => Tables.supplier(spark, sfDir)
    case "part"       => Tables.part(spark, sfDir)
    case "orders"     => Tables.orders(spark, sfDir)
    case "lineitem"   => Tables.lineitem(spark, sfDir)
    case "events"     => Tables.events(spark, sfDir)
    case "documents"  => Tables.documents(spark, sfDir)
    case "embeddings" => Tables.embeddings(spark, sfDir)
    case other => throw new IllegalArgumentException(s"unknown table: $other")
  }
}
