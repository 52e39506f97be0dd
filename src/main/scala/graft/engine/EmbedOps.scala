package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Embedding-vector operators (SURVEY.md §2.9 llm_embed_norm + the task
  * brief's similarity-search scale path): vector hygiene (norm, normalize,
  * centroid per label) and approximate nearest neighbour via random-
  * hyperplane LSH bucketing over the codegen'd vec_dot kernel.
  *
  * 100 TB notes: norms/normalization are per-row scan-speed work. Centroids
  * are one shuffle on (label, dim) — the posexplode keeps partial aggs
  * map-side combinable. Brute-force kNN against a single query vector is a
  * broadcast of the query + a global top-k (TakeOrderedAndProject) — linear
  * scan, no shuffle of the corpus. The LSH path buckets the corpus once
  * (signature = sign bits against fixed pseudo-random hyperplanes) and then
  * probes only matching buckets: corpus-side cost drops from O(n) per query
  * to O(n / 2^bits) expected, at measured recall (see EmbedOpsSpec).
  */
object EmbedOps {

  /** df + `l2norm` column, via the codegen'd vec_norm_sq kernel. */
  def withL2Norm(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    df.withColumn("l2norm", expr(s"sqrt(vec_norm_sq($vecCol))"))
  }

  /** df + `unit` column: the vector scaled to unit norm (DOUBLE elements);
    * zero vectors pass through as all-zero to avoid division by zero.
    */
  def withNormalized(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    withL2Norm(df, vecCol)
      .withColumn("unit", expr(
        s"""CASE WHEN l2norm = 0.0 THEN transform($vecCol, x -> CAST(0.0 AS DOUBLE))
           |ELSE transform($vecCol, x -> CAST(x AS DOUBLE) / l2norm) END""".stripMargin))

  /** Per-label centroid: posexplode to (label, dim, value), average per
    * (label, dim), re-assemble ordered by dim. Map-side combinable; one
    * shuffle on (label, dim).
    */
  def centroids(df: DataFrame, labelCol: String = "label",
                vecCol: String = "embedding"): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(labelCol, "dim")
      .agg(avg(col("v").cast("double")).as("mean_v"))
      .groupBy(labelCol)
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v")))).as("pairs"))
      .withColumn("centroid", expr("transform(pairs, p -> p.mean_v)"))
      .select(col(labelCol), col("centroid"))

  /** Brute-force top-k cosine neighbours of one query vector: broadcast the
    * query as a literal, score with vec_dot, global top-k.
    */
  def knnBruteForce(corpus: DataFrame, query: Seq[Float], k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val qLit = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(", ")})"
    corpus
      .withColumn("score", expr(s"vec_dot($vecCol, $qLit)"))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane projection: component d of
    * table t's plane p is ±1 from xxhash64(t, p, d) — reproducible across
    * sessions with no RNG state (Date.now/rand would break resumability).
    */
  private def planeSignExpr(vecCol: String, table: Int, plane: Int): String =
    s"""aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |  (x, d) -> CAST(x AS DOUBLE) * IF((shiftright(xxhash64($table, $plane, CAST(d AS LONG)), 7) & 1L) = 1L, 1.0D, -1.0D)),
       |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  /** Multi-table LSH bucketing: `tables` independent signatures of `bits`
    * sign bits each, packed into an INT per table → `buckets` array column.
    * Standard recall/cost dial: P(candidate) = 1 - (1 - p^bits)^tables with
    * p = 1 - θ/π. Fewer bits → bigger buckets, more tables → more probes.
    */
  def withLshBuckets(df: DataFrame, bits: Int = 4, tables: Int = 8,
                     vecCol: String = "embedding"): DataFrame = {
    val bucketExprs = (0 until tables).map { t =>
      (0 until bits)
        .map(p => s"(CAST(IF(${planeSignExpr(vecCol, t, p)} >= 0.0D, 1, 0) AS INT) * ${1 << p})")
        .mkString(" + ")
    }
    df.withColumn("buckets", expr(s"array(${bucketExprs.mkString(", ")})"))
  }

  /** ANN top-k for one query: probe only corpus rows sharing the query's
    * bucket in ANY table, then exact vec_dot scoring inside the probed set.
    * At scale the probe is a bucket-partitioned lookup, not a full scan —
    * expected probed fraction ≈ tables / 2^bits of the corpus.
    */
  def knnLsh(corpusWithBuckets: DataFrame, query: Seq[Float], k: Int,
             bits: Int = 4, tables: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpusWithBuckets.sparkSession
    VectorFunctions.register(spark)
    // compute the query's buckets with the same expression, driver-side
    import spark.implicits._
    val qDf = Seq(Tuple1(query)).toDF(vecCol)
      .withColumn(vecCol, col(vecCol).cast("array<float>"))
    val qBuckets = withLshBuckets(qDf, bits, tables, vecCol)
      .select("buckets").head().getSeq[Int](0)
    val probeCond = (0 until tables)
      .map(t => col("buckets")(t) === lit(qBuckets(t)))
      .reduce(_ || _)
    val qLit = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(", ")})"
    corpusWithBuckets
      .filter(probeCond)
      .withColumn("score", expr(s"vec_dot($vecCol, $qLit)"))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
