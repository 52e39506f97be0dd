package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, Row}

/** Single-pass write metrics via Spark's `observe()` / `CollectMetrics`
  * (SURVEY §2.2 sink hygiene): ingest auditing — row counts, null
  * counts, sums, min/max — collected DURING the write job instead of by
  * a second scan. At 100 TB the difference is literal: `write; read;
  * count` re-reads the table to learn what the write already knew, and
  * the naive `df.count(); df.write` runs the whole upstream plan twice.
  * `CollectMetrics` attaches the aggregates to the write job itself:
  * rows flow through once, each executor folds its partial metric state,
  * the driver merges — exactly a two-phase aggregate piggybacked on the
  * sink, zero extra IO.
  *
  * The metric expressions must be aggregates Spark can fold per-task
  * (count/sum/min/max/avg/count_if — the commutative partial states);
  * that is Spark's own `observe` contract, enforced at analysis time.
  */
object Observed {

  /** Write `df` as parquet at `path` while computing `metrics` (named
    * aggregate Columns, e.g. `count(lit(1)).as("rows")`,
    * `sum("value").as("total")`) in the SAME job. Returns the observed
    * row — `getAs[Long]("rows")` etc. — available immediately after the
    * write action completes.
    */
  def writeParquetWithMetrics(df: DataFrame, path: String,
                              metrics: org.apache.spark.sql.Column*): Row = {
    require(metrics.nonEmpty, "pass at least one named aggregate metric")
    val obs = Observation()
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(path)
    obsRow(obs)
  }

  /** Commit `df` into a [[SnapshotLog]] table while observing `metrics`
    * in the same write pass: (committedVersion, metricsRow).
    */
  def commitWithMetrics(spark: org.apache.spark.sql.SparkSession,
                        root: String, df: DataFrame,
                        metrics: Seq[org.apache.spark.sql.Column],
                        statsCols: Seq[String] = Nil,
                        bloomCols: Seq[String] = Nil): (Long, Row) = {
    require(metrics.nonEmpty, "pass at least one named aggregate metric")
    val obs = Observation()
    val v = SnapshotLog.commit(spark, root,
      df.observe(obs, metrics.head, metrics.tail: _*), statsCols, bloomCols)
    (v, obsRow(obs))
  }

  /** The observed metrics as a schema-carrying Row (field access by
    * metric name). `Observation.get` blocks until the first action on
    * the observed frame finishes — which has already happened by the
    * time the write returns.
    */
  private def obsRow(obs: Observation): Row = {
    val m = obs.get
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      m.values.toArray,
      org.apache.spark.sql.types.StructType(m.map { case (k, v) =>
        org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.catalyst.expressions.Literal(v).dataType)
      }.toSeq))
  }
}
