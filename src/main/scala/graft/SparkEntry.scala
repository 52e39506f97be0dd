package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every declared query obeys SURVEY.md §2.0 determinism rules: unique
  * ORDER BY, rounded/DECIMAL aggregates, identical aliases on both sides.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q12(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Windows.queries ++
      SetOps.queries ++ Temporal.queries ++ LlmOps.queries ++ Scalars.queries ++
      Training.queries ++ Reshape.queries ++ Behavioral.queries ++
      Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Windows.oracle ++
      SetOps.oracle ++ Temporal.oracle ++ LlmOps.oracle ++ Scalars.oracle ++
      Training.oracle ++ Reshape.oracle ++ Behavioral.oracle ++
      Analytics.oracle
}
