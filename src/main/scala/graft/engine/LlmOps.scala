package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-data-pipeline operators over documents + embeddings (SURVEY.md §2.9):
  * exact dedup, brute-force cosine similarity search, exact Jaccard
  * set-similarity, text statistics, TF-IDF. All vector math is expressed
  * with codegen'd higher-order functions (zip_with/aggregate) — no UDFs —
  * and DOUBLE-widened before rounding (SURVEY §2.0.4).
  *
  * 100 TB notes: q31 scales as a hash groupBy on a 128-bit digest (shuffle
  * on the hash, near-perfect key distribution). q32's all-pairs crossJoin is
  * the CORRECTNESS baseline; the scale path is MinHash-LSH candidate
  * generation (MinHashLsh.scala, test-only) which turns O(n²) into
  * O(n × bands) + bucket-local pair generation. q33's word-explode join
  * shuffles on the token — stopword-skew is the classic hazard; salting or
  * document-frequency capping handles it.
  */
object LlmOps {

  // q31 — exact dedup by content hash: keep the min doc_id per distinct
  // text (md5 parity verified Spark↔DuckDB).
  def q31(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keeper_id"),
           count(lit(1)).as("n_copies"))
      .orderBy("keeper_id")

  val q31Sql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keeper_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin

  // q32 — brute-force similarity search: global top-10 cosine pairs.
  // vec_id < vec_id halves the pair space; vectors are L2-normalized so
  // cosine == dot product. Ranked on the ROUNDED score with (i,j) tiebreak
  // so both engines order identically at the round-4 boundary.
  // The dot product is a native codegen'd expression (vec_dot) — same
  // left-to-right double accumulation as the zip_with/aggregate
  // formulation, ~40× faster (see graft.functions.VectorFunctions).
  def q32(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    // round 17: the O(n²/2) vec_dot loop runs in the stream side's stage —
    // fan the single-split scan out so it parallelizes (Tables.fanOut)
    val a = Tables.fanOut(
      e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", expr("round(vec_dot(emb_a, emb_b), 4)"))
      .select("id_a", "id_b", "cosine")
      .orderBy(desc("cosine"), col("id_a"), col("id_b"))
      .limit(10)
  }

  val q32Sql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |ORDER BY cosine DESC, id_a, id_b LIMIT 10""".stripMargin

  // q33 — exact n-gram(1) Jaccard on token sets, capped to doc_id < 100 on
  // both docs (quadratic-safe sample). Integer-exact intersection counts;
  // only the final ratio is floating (round 6).
  //
  // Plan-shaped for scale: array_distinct dedups tokens WITHIN the row
  // (no distinct shuffle at all), and the per-doc set size rides along as
  // a column through the pair join (min() in the pair agg — it is constant
  // per doc), so the tokenize subtree is computed twice (the two join
  // sides), not four times as in the naive sizes-join formulation.
  def q33(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"),
        size(array_distinct(split(col("text"), " "))).as("n_tokens"))
    jaccardPairs(toks)
  }

  /** Shared exact-Jaccard pair scaffold (q33 unigrams, q42 3-grams): input
    * (doc_id, token, n_tokens) with row-distinct tokens; output
    * (id_a, id_b, n_common, jaccard round 6) ordered by the pair.
    *
    * Stopword skew: the equi-join shuffles on `token`, so one hot token
    * ("the") would put its whole posting list — and the quadratic pair
    * generation for it — on ONE reducer. Tokens whose document frequency
    * exceeds `hotDf` are therefore routed through a grid (triangle)
    * self-join (see [[Skew.gridPairJoin]]) that spreads each hot token's
    * pair space over groups×(groups+1)/2 shuffle cells; cold tokens keep
    * the plain equi-join. Both branches emit one row per (pair, shared
    * token) and union BEFORE the count, so the result is bit-identical to
    * the unsalted join (equivalence-tested in SkewSpec on a stopword-heavy
    * corpus). The hot-token list is df-bounded and genuinely tiny (a few
    * hundred stopwords at any corpus size), so broadcasting it is safe at
    * 100 TB — unlike the full vocabulary (q35's lesson).
    */
  private[graft] def jaccardPairs(toks: DataFrame,
                                  hotDf: Long = 1000L,
                                  groups: Int = 8): DataFrame = {
    val hot = toks.groupBy("token").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf).select("token")
    val cold    = toks.join(broadcast(hot), Seq("token"), "left_anti")
    val hotRows = toks.join(broadcast(hot), Seq("token"), "left_semi")
    val pairRows = pairRowsPlain(cold)
      .unionByName(Skew.gridPairJoin(hotRows, "token", "doc_id", groups)
        .select(col("doc_id_a").as("id_a"), col("doc_id_b").as("id_b"),
                col("n_tokens_a").as("n_a"), col("n_tokens_b").as("n_b")))
    pairRows
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"), min("n_a").as("n_a"), min("n_b").as("n_b"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** One row per (doc pair, shared token) via the plain token equi-join. */
  private def pairRowsPlain(toks: DataFrame): DataFrame = {
    val a = toks.select(col("doc_id").as("id_a"), col("token"), col("n_tokens").as("n_a"))
    val b = toks.select(col("doc_id").as("id_b"), col("token").as("token_b"), col("n_tokens").as("n_b"))
    a.join(b, col("token") === col("token_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "n_a", "n_b")
  }

  val q33Sql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents WHERE doc_id < 100
      |), t AS (SELECT DISTINCT doc_id, word FROM w),
      |sz AS (SELECT doc_id, count(*) AS n_words FROM t GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM t a JOIN t b ON a.word = b.word AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b, n_common,
      |  round(CAST(n_common AS DOUBLE) / (sa.n_words + sb.n_words - n_common), 6) AS jaccard
      |FROM inter
      |JOIN sz sa ON id_a = sa.doc_id
      |JOIN sz sb ON id_b = sb.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  // q34 — text analysis per language: doc counts, token totals, average
  // length, vocabulary size. Two aggregations joined on lang (the vocab
  // side needs the exploded-distinct pass).
  def q34(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
      round(avg(length(col("text"))), 6).as("avg_chars"))
    val vocab = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .groupBy("lang")
      .agg(count(lit(1)).as("vocab"))
    base.join(vocab, "lang")
      .select("lang", "n_docs", "total_tokens", "avg_chars", "vocab")
      .orderBy("lang")
  }

  val q34Sql: String =
    """WITH w AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
      |), v AS (
      |  SELECT lang, count(*) AS vocab FROM (SELECT DISTINCT lang, word FROM w) GROUP BY lang
      |), b AS (
      |  SELECT lang, count(*) AS n_docs,
      |    sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
      |    round(avg(length(text)), 6) AS avg_chars
      |  FROM documents GROUP BY lang
      |)
      |SELECT b.lang AS lang, n_docs, total_tokens, avg_chars, vocab
      |FROM b JOIN v ON b.lang = v.lang ORDER BY lang""".stripMargin

  // q35 — TF-IDF: top-scoring term per document. tf = in-doc count,
  // idf = ln(N/df) with integer inputs (bit-identical across engines);
  // ranked on the rounded score, term as tiebreak. dfreq is
  // vocabulary-sized, so it carries NO broadcast hint: at 100 TB of text
  // the vocabulary is billions of terms and a forced broadcast would OOM
  // — AQE picks broadcast when the table is actually small and falls
  // back to a shuffled term-key join when it is not. The 1-row count IS
  // hinted (always tiny).
  def q35(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    // tf feeds BOTH dfreq and the score join — pinned (lazy localCheckpoint,
    // house style), else the tokenize + (doc,term) agg runs twice (verified
    // via plan audit: 2 corpus scans, 0 reuse). At 100 TB of text that is
    // a doubled tokenize pass over the whole corpus.
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "term", "tf", "df", "score")
      .orderBy("doc_id")
  }

  val q35Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term AS term, tf, df,
      |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM scored
      |)
      |SELECT doc_id, term, tf, df, score FROM ranked WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // q82 — generator WITH ORDINALITY (round 5): posexplode attaches each
  // token's position — the surface behind "first k tokens", positional
  // n-gram features, and any order-aware re-assembly after an explode
  // (a bare explode loses the ordinal; recovering it later needs a
  // window). Map-side Generate, no shuffle before the presentation sort.
  // The "first 3" bound is applied BEFORE the Generate via slice():
  // Generate cannot early-terminate, so explode-then-filter would
  // materialize every token per doc and discard all but 3 — at 100 TB
  // that's a ~len/3 row blowup for nothing (the round-5 perf-weak).
  // slice(arr,1,3) caps Generate's input at 3 elements per row; the
  // ord<=3 predicate becomes structural. PlanShapeSpec asserts the
  // Generate input is the sliced array.
  // DuckDB lacks WITH ORDINALITY — the oracle indexes the array through
  // a generate_series unnest, same rows.
  def q82(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(slice(split(col("text"), " "), 1, 3)))
      .select(col("doc_id"), col("col").as("word"), (col("pos") + 1).as("ord"))
      .orderBy("doc_id", "ord")

  val q82Sql: String =
    """SELECT doc_id, words[i] AS word, i::INT AS ord
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |     unnest(generate_series(1, len(words))) AS t(i)
      |WHERE i <= 3
      |ORDER BY doc_id, ord""".stripMargin

  // q86 — OUTER generator semantics (round 6): explode_outer keeps a row
  // (with a NULL element) for a NULL/absent collection where plain
  // explode silently drops the parent row. That distinction is the
  // "document with no extractable tokens must still be visible
  // downstream" contract — losing parents in a fan-out join is a classic
  // silent-data-loss bug at pipeline scale. Still a map-side Generate.
  // The null-array slice is synthesized deterministically (doc_id % 7);
  // DuckDB lacks an outer unnest, so the oracle unions the NULL-parent
  // rows back explicitly. NULLS FIRST pinned on both sides (DuckDB
  // defaults NULLS LAST where Spark defaults FIRST).
  def q86(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr",
        when(col("doc_id") % 7 =!= 0, slice(split(col("text"), " "), 1, 2)))
      .select(col("doc_id"), explode_outer(col("arr")).as("word"))
      .orderBy(col("doc_id"), asc_nulls_first("word"))

  val q86Sql: String =
    """WITH t AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN NULL
      |       ELSE string_split(text, ' ')[1:2] END AS arr
      |FROM documents)
      |SELECT doc_id, unnest(arr) AS word FROM t WHERE arr IS NOT NULL
      |UNION ALL
      |SELECT doc_id, NULL AS word FROM t WHERE arr IS NULL
      |ORDER BY doc_id, word NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_exact_dedup"  -> (q31 _),
    "q32_knn_cosine"   -> (q32 _),
    "q33_jaccard_pairs" -> (q33 _),
    "q34_text_stats"   -> (q34 _),
    "q35_tfidf"        -> (q35 _),
    "q82_posexplode"   -> (q82 _),
    "q86_explode_outer" -> (q86 _))

  val oracle: Map[String, String] = Map(
    "q31_exact_dedup"  -> q31Sql,
    "q32_knn_cosine"   -> q32Sql,
    "q33_jaccard_pairs" -> q33Sql,
    "q34_text_stats"   -> q34Sql,
    "q35_tfidf"        -> q35Sql,
    "q82_posexplode"   -> q82Sql,
    "q86_explode_outer" -> q86Sql)
}
