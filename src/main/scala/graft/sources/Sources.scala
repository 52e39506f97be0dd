package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion-edge sources (SURVEY.md §2.2): typed CSV with explicit schema
  * and bad-row policy, JSON-lines, and the reference's latest-dated-file
  * generation selection (CUNYfirst extracts are dated exports; only the
  * newest generation per query feeds a rebuild).
  *
  * 100 TB notes: both readers are plain DataSource scans — splittable,
  * predicate/column pushdown applies (for CSV only column pruning), and a
  * directory of files parallelizes across executors. FAILFAST is the
  * rebuild-pipeline default (the reference aborts on malformed extracts);
  * PERMISSIVE + corrupt-record column is the forensic mode.
  *
  * Format coverage: parquet (Tables/Verify), ORC, CSV, JSONL, binaryFile.
  * Avro is NOT covered: the external `spark-avro` connector module is not
  * on this offline classpath (only avro-core jars ship with Spark), so
  * `spark.read.format("avro")` cannot resolve here. On a deployment with
  * the connector it is one line: `spark.read.format("avro").load(path)` —
  * same splittable-scan properties as ORC.
  */
object Sources {

  /** Typed CSV read: explicit schema (never inferSchema in production —
    * inference is a full extra pass over 100 TB), header mapping, and a
    * configurable malformed-row policy.
    */
  def readCsv(s: SparkSession, path: String, schema: StructType,
              mode: String = "FAILFAST"): DataFrame =
    s.read
      .schema(schema)
      .option("header", "true")
      // validate the header against the schema's field names instead of
      // binding columns by position — a reordered export must fail loudly,
      // not silently load values into the wrong columns
      .option("enforceSchema", "false")
      .option("mode", mode)
      .csv(path)

  /** Write a DataFrame as a header'd CSV directory (round-trip fixture for
    * the ingestion tests; timestamps serialized as ISO-8601 UTC).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** JSON-lines with explicit schema (same rationale: no schema inference
    * pass at scale; unknown fields are dropped, missing fields are null).
    */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** ORC round-trip (the other columnar format Spark ships natively).
    * Same pushdown story as parquet: predicates and column pruning reach
    * the reader (asserted in SourcesSpec), so a 100 TB ORC lake queries
    * identically to parquet — format choice is an ingest-side decision.
    */
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Binary-file source for the multimodal pipeline's ingest edge: each
    * file becomes a row of (path, modificationTime, length, content) —
    * the raw bytes land in a `binary` column exactly as
    * `engine.Multimodal` expects. `pathGlobFilter` selects by extension
    * without listing-then-filtering in the driver. NOT splittable (one
    * file = one row) — fine for media objects, which are the use case;
    * `maxBytesPerFile` partitioning happens at the Spark source level.
    */
  def readBinaryFiles(s: SparkSession, dir: String,
                      glob: Option[String] = None): DataFrame = {
    val r = s.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** The reference's generation selection: inputs arrive as dated exports
    * (e.g. `QUERY_NAME-20250410.csv`); each rebuild must read ONLY the
    * newest generation. Pure driver-side listing — file metadata, not data —
    * so it costs one namenode listing at any scale.
    *
    * @param pattern regex with one capture group over the basename whose
    *                lexicographic max is the latest generation (dates in
    *                yyyyMMdd / ISO order sort correctly as strings).
    */
  def latestGeneration(s: SparkSession, dir: String, pattern: String): Option[String] = {
    val re = pattern.r
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return None
    val candidates = fs.listStatus(p).toSeq
      .filter(_.isFile)
      .flatMap { st =>
        val name = st.getPath.getName
        re.findFirstMatchIn(name).map(m => (m.group(1), st.getPath.toString))
      }
    if (candidates.isEmpty) None
    else Some(candidates.maxBy(_._1)._2)
  }
}
