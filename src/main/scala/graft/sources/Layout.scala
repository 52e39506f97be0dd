package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB deployment (SURVEY §7.3): the
  * fixtures are single parquet files, but at scale the SAME queries must
  * run against partitioned and bucketed layouts — these writers produce
  * those layouts and LayoutSpec proves the two payoffs in the plans:
  *
  *   - date-partitioned events  → event-time filters become partition
  *     pruning (the scan never opens non-matching days), and dynamic
  *     partition pruning activates on join keys;
  *   - bucketed + sorted fact tables → co-located equi-joins and
  *     aggregations on the bucket key run with NO shuffle exchange.
  */
object Layout {

  /** Write events partitioned by event date (day granularity — the
    * standard log layout; at 100 TB this is the difference between
    * scanning 1 day and scanning 3 years).
    *
    * Timezone note: with a TIMESTAMP_NTZ `ts` (what Tables.events yields)
    * `to_date` is timezone-free. For a zoned TimestampType column the day
    * boundary follows the WRITER session's spark.sql.session.timeZone —
    * readers must filter in the same zone, so pin the session tz (this
    * project pins UTC everywhere).
    */
  def writeEventsPartitionedByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Bucketed + sorted table write (requires a table catalog — bucketing
    * metadata lives in the metastore, not the files). Joins/aggs on
    * `bucketCol` between tables bucketed the same way need no exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a partitioned layout (partition column becomes a regular
    * column; filters on it prune directories before any IO).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-clustered rewrite: rows with nearby `clusterCol` values land in
    * the same files (repartitionByRange gives disjoint per-file key ranges;
    * the within-partition sort tightens row-group min/max further). Range
    * predicates on the cluster key then skip whole files/row-groups via
    * parquet statistics — at 100 TB this is the difference between reading
    * one file and reading the lake when partition-dir granularity is too
    * coarse (e.g. clustering by key inside each day partition). The range
    * boundaries come from a sampling pass (Spark's RangePartitioner), the
    * one extra job this layout costs at write time.
    */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
                          nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Z-order (Morton-curve) clustered rewrite: rows close in the
    * MULTI-dimensional key space land in the same files, so parquet
    * min/max statistics skip files/row-groups for predicates on ANY of
    * the cluster columns — where [[writeRangeClustered]] tightens only its
    * single sort key and leaves every other column spanning the full range
    * in every file. The classic lakehouse layout op (Delta/Iceberg
    * `OPTIMIZE ZORDER BY`), built here from public primitives: per-column
    * min/max normalization to `bits`-bit ints (one tiny agg job → driver
    * literals), bit interleaving as a pure codegen'd bitwise expression
    * (no UDF), then repartitionByRange + in-partition sort on the z-value.
    *
    * Skew caveat: min/max normalization assumes roughly uniform spread;
    * for heavily skewed columns substitute rank buckets (approx-quantile
    * boundaries) for the normalization — the interleave is unchanged.
    * LayoutSpec proves the payoff: per-file spans tighten on BOTH columns
    * simultaneously, which no single-key sort can do.
    */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    nFiles: Int, bits: Int = 8): Unit =
    zArrange(df, clusterCols, nFiles, bits).write.mode("overwrite").parquet(path)

  /** The Z-order ARRANGEMENT without the write — so the Morton layout
    * composes with any sink that preserves partitioning, in particular
    * [[SnapshotLog.commit]] (whose per-file stats then skip files on
    * EITHER cluster column — proven in SnapshotLogSpec).
    */
  /** The Morton key of [[zArrange]] as a bare Column — for callers
    * that must compose the range partitioning with other keys (the
    * scoped per-leaf OPTIMIZE ZORDER ranges on (leaf, z)). Buckets
    * derive from GLOBAL min/max of `df`; the caller applies the key to
    * the same frame (or a projection-compatible one).
    */
  def zKeyColumn(df: DataFrame, clusterCols: Seq[String],
                 bits: Int = 8): Column = {
    require(clusterCols.size >= 2, "z-order needs >= 2 columns (use writeRangeClustered for 1)")
    require(bits >= 1 && bits * clusterCols.size <= 62, s"bits=$bits too wide")
    val aggs = clusterCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val maxBucket = (1L << bits) - 1
    // bucket each column into [0, 2^bits), then interleave: bit i of
    // column j lands at z-bit i*k + j (round-robin — the Morton layout).
    // A column with no range (empty input, or all-null — min/max are
    // null) contributes a constant zero bucket: the curve degrades to
    // ordering by the remaining usable columns instead of aborting the
    // nFiles sizing and clustering wholesale.
    clusterCols.zipWithIndex.map { case (c, j) =>
      val bucket =
        if (stats.isNullAt(stats.fieldIndex(s"__min_$c"))) lit(0L)
        else {
          val lo = stats.getDouble(stats.fieldIndex(s"__min_$c"))
          val hi = stats.getDouble(stats.fieldIndex(s"__max_$c"))
          val span = if (hi > lo) hi - lo else 1.0
          least(lit(maxBucket),
            floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble + 1)))
            .cast("long")
        }
      (0 until bits).map { i =>
        shiftleft((bucket.bitwiseAND(lit(1L << i)) =!= lit(0L)).cast("long"),
          i * clusterCols.size + j)
      }.reduce[Column](_.bitwiseOR(_))
    }.reduce[Column](_.bitwiseOR(_))
  }

  def zArrange(df: DataFrame, clusterCols: Seq[String],
               nFiles: Int, bits: Int = 8): DataFrame =
    df.withColumn("__z", zKeyColumn(df, clusterCols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Small-files compaction: rewrite a parquet dataset into files near
    * `targetBytes` each. The chronic 100 TB failure mode is the opposite of
    * big data — millions of KB-sized files from fine-grained ingestion turn
    * every scan into namenode + open() overhead. Partition count derives
    * from the CURRENT on-disk bytes (compressed, so output files land close
    * to target); `maxRecordsPerFile` is deliberately not used — it caps but
    * cannot merge.
    *
    * Returns (filesBefore, filesAfter-as-planned). The rewrite is a plain
    * round-robin repartition: no shuffle key to preserve; if the dataset is
    * bucketed/sorted, compact per bucket via [[writeBucketed]] instead.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L << 20): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(inDir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    // A hive-partitioned layout has no top-level data files — sizing from 0
    // bytes would funnel the whole dataset through ONE task and flatten the
    // partitioning. Refuse loudly, with a diagnosis that matches what's
    // actually there (partition subdirectories vs nothing at all).
    if (dataFiles.isEmpty) {
      val hasSubdirs = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
        .exists(_.isDirectory)
      throw new IllegalArgumentException(
        if (hasSubdirs)
          s"$inDir contains subdirectories but no top-level .parquet files — " +
            "looks partitioned; compact each partition directory separately"
        else s"$inDir contains no .parquet files — nothing to compact")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val nParts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nParts)
      .write.mode("overwrite").parquet(outDir)
    (dataFiles.size, nParts)
  }
}
