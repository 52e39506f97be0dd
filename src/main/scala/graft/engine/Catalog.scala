package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Downstream-consumption surface (SURVEY §3.1.3): the reference's users
  * run ad-hoc SQL against the built catalog; here that is temp views over
  * the fixture tables plus the engine's registered functions, so
  * `spark.sql("SELECT ... FROM lineitem ...")` works immediately.
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
