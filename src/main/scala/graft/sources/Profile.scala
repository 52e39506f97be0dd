package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** One-pass data profiling — the between-generations sanity check the
  * reference does by eye (row counts per extract, unexpected nulls, key
  * cardinality) as a single operator.
  *
  * The whole profile is ONE aggregation job no matter how many columns:
  * 4 aggregates per column ride one scan (partial+final hash agg, no
  * shuffle of data rows — only the single state row). The naive
  * loop-per-column formulation costs numColumns full scans; at 100 TB
  * that difference is the whole game. Distinct counts are HLL
  * (approx_count_distinct) for the same reason — exact distinct per
  * column would add a shuffle per column.
  */
object Profile {

  /** Per-column stats: (column, n_rows, n_nulls, approx_distinct, min, max).
    * min/max surface as strings so one result schema fits every column
    * type. The single wide agg row is reshaped driver-side — O(columns).
    */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(col(f.name)).as(s"${f.name}__distinct"),
        min(col(f.name)).cast("string").as(s"${f.name}__min"),
        max(col(f.name)).cast("string").as(s"${f.name}__max"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*).head()
    val nRows = row.getLong(0)
    // sum() over zero rows is NULL — an empty generation must profile as
    // n_rows=0 (the case drift() most needs to flag), not NPE
    def longOr0(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    val out = fields.zipWithIndex.map { case (f, i) =>
      val base = 1 + i * 4
      Row(f.name, nRows, longOr0(base), longOr0(base + 1),
        if (row.isNullAt(base + 2)) null else row.getString(base + 2),
        if (row.isNullAt(base + 3)) null else row.getString(base + 3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType.fromDDL(
        "column STRING, n_rows BIGINT, n_nulls BIGINT, approx_distinct BIGINT, " +
          "min STRING, max STRING"))
  }

  /** Drift between two generations' profiles, per shared column: row-count
    * ratio plus null-rate and distinct-count deltas. Feed it
    * `profile(gen1)` / `profile(gen2)`; flag rows where `null_rate_delta`
    * or `distinct_ratio` moved beyond the pipeline's tolerance.
    */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("column"), col("n_rows").as("rows_before"),
      col("n_nulls").as("nulls_before"), col("approx_distinct").as("distinct_before"))
    val a = after.select(col("column"), col("n_rows").as("rows_after"),
      col("n_nulls").as("nulls_after"), col("approx_distinct").as("distinct_after"))
    b.join(a, "column")
      .withColumn("row_ratio",
        when(col("rows_before") > 0, col("rows_after").cast("double") / col("rows_before")))
      .withColumn("null_rate_delta",
        coalesce(col("nulls_after").cast("double") / nullif(col("rows_after"), lit(0L)), lit(0.0)) -
        coalesce(col("nulls_before").cast("double") / nullif(col("rows_before"), lit(0L)), lit(0.0)))
      .withColumn("distinct_ratio",
        when(col("distinct_before") > 0,
          col("distinct_after").cast("double") / col("distinct_before")))
  }
}
