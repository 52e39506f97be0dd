package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 test-only surface: RANGE-interval window frames,
  * map functions, approximate distinct, and the UDF/UDAF/UDTF escape
  * hatches with their usage policy.
  *
  * POLICY (§2.10): built-ins first, always. A Scala UDF blocks codegen,
  * blackboxes the expression for the optimizer (no pushdown through it)
  * and pays serialization per row. Preference order when built-ins can't
  * express something: native Catalyst Expression (VectorFunctions.scala) >
  * typed Aggregator > Scala UDF. Generators: explode/posexplode/inline
  * cover the UDTF space (q33-q35 exercise them); a custom Generator
  * Expression is the escape hatch none of the declared surface needs.
  */
object Extras {

  /** RANGE-with-interval frame: per-user average of `value` over the
    * trailing 1 hour, via rangeBetween on epoch seconds (Spark's
    * rangeBetween needs a numeric ORDER BY; DuckDB would use RANGE BETWEEN
    * INTERVAL — dialect-divergent, hence test-only per SURVEY §2.6).
    */
  def trailingHourAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_s"))
      .rangeBetween(-3600L, Window.currentRow)
    events
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .withColumn("avg_1h", round(avg(col("value")).over(w), 6))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("avg_1h"))
  }

  /** Map-typed column operations (test-only — DuckDB MAP dialect diverges). */
  def mapFuncsDemo(df: DataFrame, keysCol: String, valsCol: String): DataFrame =
    df.withColumn("m", map_from_arrays(col(keysCol), col(valsCol)))
      .withColumn("m_keys", map_keys(col("m")))
      .withColumn("m_vals", map_values(col("m")))
      .withColumn("m_size", size(col("m")))

  /** str_to_map over "k1:v1,k2:v2" payloads. */
  def strToMapDemo(df: DataFrame, strCol: String): DataFrame =
    df.withColumn("m", expr(s"str_to_map($strCol, ',', ':')"))

  /** Nested-JSON assembly — the reference's JSONB course-components column
    * (per-course array of {component, hours} objects) rebuilt relationally:
    * child rows → ordered array of structs per parent key → JSON string.
    * One shuffle on the parent key; array_sort keeps the output
    * deterministic (SURVEY §2.0.9).
    */
  def assembleComponentsJson(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_orderkey")
      .agg(to_json(array_sort(collect_list(struct(
        col("l_linenumber").as("line"),
        col("l_quantity").as("qty"))))).as("components_json"),
        count(lit(1)).as("n_components"))

  /** HLL approximate distinct (sketches differ across engines by design —
    * asserted ±5% of exact in ExtrasSpec, never oracle-declared).
    */
  def approxDistinctParts(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"))

  /** The one registered example scalar UDF (escape-hatch surface proof):
    * title-cases a string. Everything it does is deliberately also possible
    * with initcap — the spec asserts the equivalence, documenting that the
    * UDF was avoidable.
    */
  def registerTitleCaseUdf(spark: SparkSession): Unit =
    spark.udf.register("title_case", (s: String) =>
      if (s == null) null
      else s.split(" ").map(w =>
        if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase)
        .mkString(" "))

  /** Typed custom aggregate (UDAF surface): exact median via sorted buffer.
    * Buffer is the collected values — O(group size) memory, which is why
    * percentile_cont (sort-based, spillable) is preferred for declared
    * queries; this demonstrates the Aggregator[IN, BUF, OUT] contract.
    */
  object ExactMedian extends Aggregator[Double, Seq[Double], Double] {
    override def zero: Seq[Double] = Vector.empty  // Vector: O(~1) append, not List's O(n)
    override def reduce(b: Seq[Double], a: Double): Seq[Double] = b :+ a
    override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] = b1 ++ b2
    override def finish(r: Seq[Double]): Double = {
      if (r.isEmpty) return Double.NaN
      val s = r.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the median Aggregator as a SQL-callable UDAF. */
  def registerExactMedian(spark: SparkSession): Unit =
    spark.udf.register("exact_median", udaf(ExactMedian))
}
