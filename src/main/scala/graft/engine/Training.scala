package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data operators declared with exact oracles (task brief: dedup /
  * text analysis "each as a queries() entry with an oracle on the documents
  * table" where cross-engine-exact — the sketch-based variants stay
  * test-only per SURVEY §2.0.10):
  *
  *   q41 — embedding-cosine near-dup pairs (brute-force exact; the LSH
  *         candidate version in EmbedOps is the at-scale path)
  *   q42 — word 3-gram Jaccard (n-gram upgrade of q33's unigram sets)
  *   q43 — token counting: whitespace + BPE-ish regex pre-tokenizer
  *   q44 — quality scoring: length/alpha/punct/stopword/repetition features
  */
object Training {

  // q41 — all pairs with cosine >= 0.4 (non-empty at every fixture SF;
  // DOUBLE math + round 4 per SURVEY §2.0.4, ranked/tiebroken by ids).
  def q41(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    // round 17: the O(n²/2) vec_dot loop runs in the stream side's stage —
    // fan the single-split scan out so it parallelizes (Tables.fanOut)
    val a = Tables.fanOut(
      e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", expr("round(vec_dot(emb_a, emb_b), 4)"))
      .filter(col("cosine") >= 0.4)
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  val q41Sql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'), 4) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'), 4) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // q42 — word 3-gram Jaccard, doc_id < 100 cap, docs with >= 3 words.
  // Same plan shape as q33: in-row distinct grams, set size rides the join.
  def q42(s: SparkSession, dir: String): DataFrame = {
    val gramsExpr = expr(
      """array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
        |  i -> array_join(slice(split(text, ' '), i + 1, 3), ' ')))""".stripMargin)
    val toks = Tables.documents(s, dir)
      .filter(col("doc_id") < 100 && size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(gramsExpr).as("token"),
              size(gramsExpr).as("n_tokens"))
    LlmOps.jaccardPairs(toks)
  }

  val q42Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |  WHERE doc_id < 100 AND len(string_split(text, ' ')) >= 3
      |), g0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 2),
      |    i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS gram
      |  FROM d
      |), g AS (SELECT DISTINCT doc_id, gram FROM g0),
      |sz AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b, n_common,
      |  round(CAST(n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - n_common), 6) AS jaccard
      |FROM inter
      |JOIN sz sa ON id_a = sa.doc_id
      |JOIN sz sb ON id_b = sb.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  // q43 — token counting: whitespace tokenization + the BPE-ish
  // pre-tokenizer regex (letter runs | digit runs | single punctuation).
  def q43(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_txt"),
        size(split(col("text"), "\\s+")).as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
          .as("bpe_tokens"))
      .orderBy("doc_id")

  val q43Sql: String =
    """SELECT doc_id,
      |  length(text)::INT AS n_chars_txt,
      |  len(string_split_regex(text, '\s+'))::INT AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::INT AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // q44 — quality scoring features + bounded composite, all ratios in
  // DOUBLE with explicit zero-length guards; stopword list = fixture
  // vocabulary markers so the ratio is non-trivial on this corpus.
  private val stopList = Seq("join", "hash", "scan", "row", "index", "query", "table", "merge")

  // The composite is built from the UNROUNDED ratios on both sides — feeding
  // rounded (6 dp) inputs into the weighted sum lands the result exactly on
  // a 7th-decimal .5 boundary for some rows, where the two engines' round()
  // can disagree (observed). Raw doubles are bit-identical across engines,
  // so the single final round is safe.
  def q44(s: SparkSession, dir: String): DataFrame = {
    val stops = stopList.map(w => s"'$w'").mkString(", ")
    val alphaRaw = "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text)"
    val punctRaw = "CAST(length(regexp_replace(text, '[^.,;:!?]', '')) AS DOUBLE) / length(text)"
    val dedupRaw = "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / size(split(text, ' '))"
    Tables.documents(s, dir)
      .filter(length(col("text")) > 0)   // fixture texts are non-empty; keep the contract explicit
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("alpha_ratio", expr(s"round($alphaRaw, 6)"))
      .withColumn("punct_ratio", expr(s"round($punctRaw, 6)"))
      .withColumn("stopword_ratio", expr(
        s"round(CAST(size(filter(split(text, ' '), t -> t IN ($stops))) AS DOUBLE) / size(split(text, ' ')), 6)"))
      .withColumn("dedup_ratio", expr(s"round($dedupRaw, 6)"))
      .withColumn("quality", expr(
        s"""round(least(CAST(1.0 AS DOUBLE),
           |  least(CAST(size(split(text, ' ')) AS DOUBLE) / 50.0, CAST(1.0 AS DOUBLE)) * 0.3 +
           |  ($alphaRaw) * 0.3 + (1.0 - ($punctRaw)) * 0.1 + ($dedupRaw) * 0.3), 6)""".stripMargin))
      .select("doc_id", "n_tokens", "alpha_ratio", "punct_ratio",
              "stopword_ratio", "dedup_ratio", "quality")
      .orderBy("doc_id")
  }

  val q44Sql: String = {
    val stops = stopList.map(w => s"'$w'").mkString(", ")
    val alphaRaw = "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)"
    val punctRaw = "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)"
    val dedupRaw = "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))"
    s"""SELECT doc_id,
       |  len(string_split(text, ' '))::INT AS n_tokens,
       |  round($alphaRaw, 6) AS alpha_ratio,
       |  round($punctRaw, 6) AS punct_ratio,
       |  round(CAST(len(list_filter(string_split(text, ' '), t -> list_contains([$stops], t))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
       |  round($dedupRaw, 6) AS dedup_ratio,
       |  round(least(CAST(1.0 AS DOUBLE),
       |    least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, CAST(1.0 AS DOUBLE)) * 0.3 +
       |    ($alphaRaw) * 0.3 + (1.0 - ($punctRaw)) * 0.1 + ($dedupRaw) * 0.3), 6) AS quality
       |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin
  }

  // q53 — stopword filtering as a TRANSFORMATION (q34/q44 only measure):
  // drop stopword tokens, keep the rest in order, count what was removed.
  // HOF filter runs per-row at scan speed — no explode/regroup round trip
  // through a shuffle, which is the naive formulation's cost.
  def q53(s: SparkSession, dir: String): DataFrame = {
    val stops = Seq("a", "the")
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_join(filter(toks, w => !w.isin(stops: _*)), " ").as("text_filtered"),
        size(filter(toks, w => w.isin(stops: _*))).as("n_stopwords"))
      .orderBy("doc_id")
  }

  val q53Sql: String =
    """SELECT doc_id,
      |  array_to_string(list_filter(string_split(text, ' '),
      |    w -> w NOT IN ('a', 'the')), ' ') AS text_filtered,
      |  len(list_filter(string_split(text, ' '),
      |    w -> w IN ('a', 'the')))::INT AS n_stopwords
      |FROM documents ORDER BY doc_id""".stripMargin

  // q55 — deterministic stratified sampling: keep k docs per source by
  // ranking on md5 of the id (md5 is byte-identical across engines — q31
  // relies on the same fact). This is the curation primitive "cap every
  // source's contribution" with reproducible picks and NO RNG state: the
  // sample is a pure function of the ids, so re-runs, retries, and other
  // engines agree row-for-row. One shuffle on the stratum key;
  // WindowGroupLimit keeps only k rows per group pre-sort at scale.
  def q55(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("doc_id"), col("source"), col("rn"))
      .orderBy("source", "rn")
  }

  val q55Sql: String =
    """SELECT doc_id, source, rn::INT AS rn FROM (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents
      |) WHERE rn <= 10 ORDER BY source, rn""".stripMargin

  // q56 — sequence packing: greedily pack documents into fixed token
  // budgets (the pre-training batching op: concat docs until ~N tokens,
  // start the next chunk). chunk = floor(tokens-before-this-doc / budget),
  // computed from a running sum — one window pass, integer math, exactly
  // reproducible. The window partitions by source — NOT a global sort, but
  // `source` is low-cardinality, so at corpus scale each source is still a
  // single-task sort (the q23 problem behind a small key). This declared
  // query is the exact-oracle baseline; the at-scale path is
  // [[sequencePackSharded]], which packs within (source, hash sub-shard)
  // — valid because packing order is a CHOICE, not a semantic (any
  // deterministic order yields equally-valid chunks) — and is benched as
  // x56 next to this exact formulation.
  def q56(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, dir)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id", floor((col("cum") - col("n_tok")) / 500.0).cast("long"))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("chunk_tokens"))
      .orderBy("source", "chunk_id")
  }

  val q56Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, len(string_split(text, ' '))::INT AS n_tok
      |  FROM documents
      |), c AS (
      |  SELECT source, n_tok,
      |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d
      |)
      |SELECT source, CAST(floor((cum - n_tok) / 500.0) AS BIGINT) AS chunk_id,
      |  count(*) AS n_docs, sum(n_tok)::BIGINT AS chunk_tokens
      |FROM c GROUP BY source, chunk_id ORDER BY source, chunk_id""".stripMargin

  /** Scale path for q56: per-document chunk assignment packing within
    * (source, sub-shard) instead of per source alone. The sub-shard is
    * `Skew.salt(doc_id, shards)` — the project-wide deterministic salt —
    * so the window sort runs over `shards` bounded partitions per source
    * and NO single task ever sorts a whole source. Chunk ids are LOCAL to
    * a (source, shard) pair; (source, shard, chunk_id) is the pack key.
    *
    * Semantics note: greedy packing by doc_id order is a reproducibility
    * choice, not a requirement — any deterministic order yields valid
    * chunks (every doc in exactly one chunk, chunks start when the running
    * total crosses the budget). Sub-sharding changes WHICH docs share a
    * chunk, never the budget invariant, which holds per shard:
    * tokens-before-doc ∈ [chunk·budget, (chunk+1)·budget)  — asserted in
    * SequencePackSpec. With shards = 1 this is exactly q56's packing.
    */
  def packAssignments(docs: DataFrame, budget: Int = 500,
                      shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .withColumn("shard", Skew.salt(col("doc_id"), shards))
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id",
        floor((col("cum") - col("n_tok")) / budget.toDouble).cast("long"))
      .select("doc_id", "source", "shard", "n_tok", "cum", "chunk_id")
  }

  /** q56's aggregated shape on the sub-sharded packing (bench twin x56):
    * one row per (source, shard, chunk_id) with doc and token counts.
    */
  def sequencePackSharded(docs: DataFrame, budget: Int = 500,
                          shards: Int = 32): DataFrame =
    packAssignments(docs, budget, shards)
      .groupBy("source", "shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("chunk_tokens"))

  // q57 — weighted mixture sampling: admit each doc with a per-source
  // probability, deterministically — the hash of the id IS the random
  // draw (md5 first 8 hex nibbles / 2^32 is uniform on [0,1) and exact in
  // a double), so the mixture is reproducible across retries, engines,
  // and cluster sizes with zero RNG coordination. Scan-speed map-only op.
  def q57(s: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    val weight = when(col("source").isin("src0", "src1", "src2"), 0.8)
      .otherwise(0.25)
    Tables.documents(s, dir)
      .filter(u < weight)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  val q57Sql: String =
    """SELECT doc_id, source FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 4294967296.0
      |      < CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0.8 ELSE 0.25 END
      |ORDER BY doc_id""".stripMargin

  // q59 — test-set contamination detection: which training docs share a
  // verbatim word 8-gram with the held-out slice (top 10% of doc ids —
  // the cutoff is RELATIVE, computed in-plan from max(doc_id) with pure
  // integer math, so the query is scale-free and engine-exact). The
  // pre-training hygiene op: 8-gram overlap is the standard proxy for
  // eval-set leakage; 3-grams flag nearly every doc (measured), 8-grams
  // flag true near-copies only.
  //
  // Plan shape: grams dedup IN-ROW (array_distinct before the explode —
  // no distinct shuffle over the corpus), the test slice dedups its gram
  // set, and the join shuffles on the gram key. 8-grams are near-unique,
  // so the key distribution has no stopword-style hot keys (unlike q33's
  // unigrams) and each shared (doc, gram) matches exactly once — count(*)
  // IS the distinct shared-gram count. At 100 TB the test slice is a
  // fixed eval set (MBs–GBs of grams): broadcastable when small, plain
  // shuffle join otherwise — nothing here is corpus-quadratic.
  def q59(s: SparkSession, dir: String): DataFrame = {
    // round 17: 8-gram construction dominates the scan stage — fan out
    val docs = Tables.fanOut(Tables.documents(s, dir))
    val words = split(col("text"), " ")
    val grams8 = expr(
      """array_distinct(transform(sequence(0, size(split(text, ' ')) - 8),
        |  i -> array_join(slice(split(text, ' '), i + 1, 8), ' ')))""".stripMargin)
    val mx = docs.agg(max(col("doc_id")).as("m"))
    // one explicit repartition on the gram BEFORE the test/corpus branch:
    // both branches consume the SAME exchange (ReuseExchange), so the
    // string-heavy gram explode is computed once, not once per branch;
    // the branch filters, the test-side distinct, and the join all run on
    // that partitioning without further shuffles
    val g = docs
      .filter(size(words) >= 8)
      .crossJoin(broadcast(mx)) // one-row side result, same class as q50
      .select(col("doc_id"), col("m"), explode(grams8).as("gram"))
      .repartition(col("gram"))
    val test = g.filter(col("doc_id") * 10 > col("m") * 9)
      .select(col("gram")).distinct()
    g.filter(col("doc_id") * 10 <= col("m") * 9)
      .join(test, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  val q59Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), mx AS (SELECT max(doc_id) AS m FROM documents),
      |g0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 7),
      |    i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS gram
      |  FROM d WHERE len(w) >= 8
      |), g AS (SELECT DISTINCT doc_id, gram FROM g0),
      |test AS (
      |  SELECT DISTINCT gram FROM g, mx WHERE doc_id * 10 > m * 9
      |)
      |SELECT g.doc_id, count(*) AS n_shared
      |FROM g JOIN test USING (gram), mx
      |WHERE g.doc_id * 10 <= m * 9
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  // q60 — deterministic fixed-budget GLOBAL sample: the k docs with the
  // smallest md5(doc_id) — a uniform random-looking draw that is a pure
  // function of the ids (q55 caps per stratum; this caps the whole
  // corpus). No RNG state, so retries/engines/cluster sizes agree
  // row-for-row, and the plan is TakeOrderedAndProject (per-partition
  // top-k + driver merge of k rows — q24's class, NO global sort even
  // though the ORDER BY is global).
  def q60(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(100)

  val q60Sql: String =
    """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
      |FROM documents ORDER BY h, doc_id LIMIT 100""".stripMargin

  /** Generic contamination scan between two corpora (q59 is the
    * fixture-bound declared twin): per-`corpus`-doc count of distinct word
    * n-grams shared with ANY `testSet` doc. Docs with no overlap are
    * absent from the output (join semantics — the common case is a tiny
    * contaminated set).
    *
    * Plan: in-row gram dedup on both sides (no corpus-wide distinct),
    * test grams dedup within their own slice, equi-join on the
    * near-unique gram key, per-doc count. The eval set is typically MBs —
    * its gram side is broadcastable; the corpus side never is and never
    * needs to be.
    */
  def contamination(corpus: DataFrame, testSet: DataFrame, n: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(n >= 1)
    // one shingle implementation project-wide (MinHashLsh.shingles): a fix
    // to gram semantics lands everywhere at once
    def grams(df: DataFrame): DataFrame =
      MinHashLsh.shingles(df, n, idCol, textCol)
        .withColumnRenamed("shingle", "gram")
    grams(corpus)
      .join(grams(testSet).select("gram").distinct(), "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Decontamination: drop every corpus doc sharing at least `minShared`
    * distinct word n-grams with the test set — the transformation q59's
    * report feeds. A left-anti join against the contaminated-id set: one
    * shuffle per side on the id, same plan class as exact dedup.
    */
  def decontaminate(corpus: DataFrame, testSet: DataFrame, n: Int = 8,
                    minShared: Long = 1L, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val hits = contamination(corpus, testSet, n, idCol, textCol)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol).as("__contaminated_id"))
    corpus.join(hits, corpus(idCol) === hits("__contaminated_id"), "left_anti")
  }

  // q79 — in-document repetition ratio (round 5): the Gopher/C4-family
  // quality rule that brute exact/near dedup can't see — a document that
  // repeats ITSELF (boilerplate loops, template spam) has a low
  // distinct-to-total n-gram ratio. All in-row HOFs (split → gram
  // transform → array_distinct), zero shuffles before the presentation
  // sort: the filter threshold makes this a scan-speed corpus gate at any
  // size. Integer counts + one rounded division — engine-exact.
  def q79(s: SparkSession, dir: String): DataFrame = {
    // split ONCE into a column: a HOF lambda re-evaluates its body per
    // gram index with no CSE, so slicing `split(text)` inside the lambda
    // would re-split the whole text per gram — O(words × len) per row.
    // n_grams comes from the word count, not a second transform pass.
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"),
        (size(col("words")) - 1).as("n_grams"),
        size(array_distinct(expr(
          "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i + 1]))")))
          .as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  val q79Sql: String =
    """SELECT doc_id,
      |  (len(string_split(text, ' ')) - 1)::INT AS n_grams,
      |  len(list_distinct(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' '))))::INT
      |    AS n_distinct,
      |  round(1.0 - len(list_distinct(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' '))))
      |    / (len(string_split(text, ' ')) - 1), 6) AS rep_ratio
      |FROM documents
      |WHERE len(string_split(text, ' ')) >= 2
      |ORDER BY doc_id""".stripMargin

  // q87 — overlapping context-window chunking (round 6): split each doc
  // into token windows of CHUNK tokens advancing by STRIDE (the standard
  // pre-training / RAG chunker — overlap preserves context across
  // boundaries). Start count = ceil(max(n−CHUNK,0)/STRIDE)+1, so every
  // token lands in ≥1 chunk and the final chunk may run short — the
  // full-coverage rule, pinned identically in both engines' integer
  // arithmetic. Plan shape: the starts sequence is generated map-side
  // per row (a bounded ~n/STRIDE-element array, q68's calendar-grid
  // idiom) and the chunk text is slice+join projections — no shuffle
  // before the presentation sort, and the Generate input is already the
  // exact start list (q82's slice-before-explode rule: nothing
  // over-generated, nothing filtered after).
  private val ChunkLen = 30
  private val ChunkStride = 20

  /** Reusable chunker behind q87 (PropertiesSpec proves it equals
    * driver-side sliding slices for arbitrary corpora). `k` tokens per
    * chunk advancing by `stride`; chunk count ceil(max(n−k,0)/stride)+1.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, stride: Int): DataFrame = {
    require(k >= 1 && stride >= 1, s"bad chunk geometry k=$k stride=$stride")
    docs
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("n", size(col("toks")))
      .select(col(idCol), col("toks"),
        posexplode(expr(
          s"sequence(0, CAST((greatest(n - $k, 0) + ${stride - 1}) DIV $stride AS INT))"))
          .as(Seq("pos", "i")))
      .withColumn("chunk_id", col("i").cast("int"))
      .withColumn("chunk_toks", expr(s"slice(toks, i * $stride + 1, $k)"))
      .withColumn("chunk_len", size(col("chunk_toks")).cast("int"))
      .withColumn("chunk", array_join(col("chunk_toks"), " "))
      .select(col(idCol), col("chunk_id"), col("chunk_len"), col("chunk"))
  }

  def q87(s: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(s, dir), "doc_id", "text", ChunkLen, ChunkStride)
      .orderBy("doc_id", "chunk_id")

  val q87Sql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |  s AS (SELECT doc_id, toks,
      |    unnest(generate_series(0,
      |      ((greatest(n - $ChunkLen, 0) + ${ChunkStride - 1}) // $ChunkStride))) AS i
      |  FROM t)
      |SELECT doc_id, i::INT AS chunk_id,
      |  len(list_slice(toks, i * $ChunkStride + 1, i * $ChunkStride + $ChunkLen))::INT AS chunk_len,
      |  array_to_string(list_slice(toks, i * $ChunkStride + 1, i * $ChunkStride + $ChunkLen), ' ') AS chunk
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  // q88 — corpus-driven boilerplate pruning (round 6): drop every term
  // whose DOCUMENT frequency exceeds θ·N — the data-driven counterpart
  // of q53's fixed stopword list (sklearn's CountVectorizer max_df, the
  // df-cap step of classic text pipelines). The discovered set adapts to
  // the corpus: template navigation text, license headers, scraped
  // chrome all cross the df cap without anyone curating a lexicon.
  // Scale shape: scan 1 aggregates the corpus down to ≤|vocab| (term,df)
  // rows; the >θ·N survivors are BOUNDED — by the Zipf/pigeonhole bound
  // at most L/θ terms (L = mean tokens/doc) can appear in >θ·N docs, a
  // per-doc-length constant independent of corpus size — so collecting
  // them into one broadcast array is legitimate where broadcasting
  // q35's full unbounded vocabulary would not be. Scan 2 then applies
  // the set as a per-row HOF filter at scan speed (q53's shape): no
  // explode/regroup shuffle, no join against the token stream.
  // θ = 0.78 bisects the fixture's deliberately near-uniform 31-term
  // vocabulary (30 terms sit at df 75–80%); the threshold is integer-
  // exact both engines (df·50 > N·39, no float compare). DuckDB traps:
  // array_to_string([]) yields NULL (Spark's array_join yields '') and
  // list() over zero rows yields NULL (collect_set yields []) — both
  // coalesced in the oracle so an all-kept or none-pruned corpus still
  // hash-matches.
  def q88(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dfreq = words.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val bw = dfreq.crossJoin(broadcast(n))
      .filter(col("df") * 50 > col("n_docs") * 39)
      .agg(collect_set("term").as("bw_terms")) // one bounded row (Zipf cap)
    val toks = split(col("text"), " ")
    docs.crossJoin(broadcast(bw))
      .select(col("doc_id"),
        array_join(filter(toks, w => !array_contains(col("bw_terms"), w)), " ")
          .as("text_pruned"),
        size(filter(toks, w => array_contains(col("bw_terms"), w)))
          .as("n_pruned"))
      .orderBy("doc_id")
  }

  val q88Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), dfreq AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM words GROUP BY term
      |), n AS (SELECT count(*) AS n_docs FROM documents),
      |bw AS (
      |  SELECT coalesce(list(term), []) AS terms
      |  FROM dfreq, n WHERE df * 50 > n_docs * 39
      |), joined AS (
      |  SELECT d.doc_id, string_split(d.text, ' ') AS toks, bw.terms AS bwt
      |  FROM documents d, bw
      |)
      |SELECT doc_id,
      |  coalesce(array_to_string(
      |    list_filter(toks, w -> NOT list_contains(bwt, w)), ' '), '') AS text_pruned,
      |  len(list_filter(toks, w -> list_contains(bwt, w)))::INT AS n_pruned
      |FROM joined ORDER BY doc_id""".stripMargin

  // q90 — corpus vocabulary heavy hitters (round 7): the top-k most
  // frequent tokens with a deterministic (count DESC, token) tie-break —
  // the first statistic every tokenizer-training / vocab-building run
  // computes. Scale shape: explode is map-side, the count aggregates
  // with map-side partial combine down to |vocab| rows, and the top-k is
  // TakeOrderedAndProject (per-partition heaps, no global sort) — the
  // shuffle carries vocabulary-sized data regardless of corpus size.
  def q90(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  val q90Sql: String =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  // q105 — BM25 retrieval scoring (round 16; Robertson k1=1.2, b=0.75,
  // +1 idf so every matched doc scores positive): top-50 documents for a
  // fixed query-term set over the space-token corpus. Declarative
  // corpus-statistics shape: one token explode feeds doc-length, term
  // frequency and document frequency; N/avgdl ride as broadcast
  // singleton aggregates — at 100 TB every piece is a hash aggregate +
  // broadcast join, no collect. Determinism: double math mirrored
  // textually on both sides, one final round(4), ORDER BY the ROUNDED
  // score (SURVEY §2.0.2 — the ≤3-term fp sum is tie-safe after
  // rounding, doc_id breaks the rest).
  def q105(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "join", "index")
    val docs = Tables.documents(s, dir)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("token").isin(qTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(avgdl))
      .withColumn("w",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 4).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(50)
  }

  val q105Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |), toks2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks2
      |       WHERE token IN ('hash', 'join', 'index') GROUP BY doc_id, token),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |stats AS (SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
      |                 (SELECT avg(dl) FROM dl) AS avgdl)
      |SELECT tf.doc_id,
      |       round(sum(ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
      |         * (tf.tf * 2.2)
      |         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 4) AS bm25
      |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (token) CROSS JOIN stats
      |GROUP BY tf.doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin

  // q107 — PMI collocations (round 16): pointwise mutual information of
  // ADJACENT token pairs, min count 5, top 20. ln(c12·T²/(B·c1·c2)) with
  // every count cast to DOUBLE before any product (a long product of
  // corpus-scale counts overflows) in textually mirrored order; empty/
  // one-token docs guarded on the Spark side (sequence(0, -1) would
  // DESCEND, not empty) and naturally empty under DuckDB's range().
  def q107(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("l"))
    val uni = docs.select(explode(col("l")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c1"))
    val bg = docs.select(explode(expr(
        "CASE WHEN size(l) >= 2 THEN transform(sequence(0, size(l) - 2), " +
        "i -> struct(l[i] AS w1, l[i + 1] AS w2)) " +
        "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 5)
    val tUni = uni.agg(count(lit(1)).as("t_uni"))
    val tBig = bg.agg(count(lit(1)).as("t_big"))
    // the unigram table is the FULL vocabulary — corpus-scale, so no
    // broadcast hint (AQE broadcasts it at bench scale, shuffles it at
    // 100 TB); only the singleton totals are forced broadcasts
    // (review r16)
    bc.join(uc.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(uc.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .crossJoin(broadcast(tUni)).crossJoin(broadcast(tBig))
      .withColumn("pmi", round(log(
        col("c12").cast("double") * col("t_uni").cast("double") *
          col("t_uni").cast("double") /
          (col("t_big").cast("double") * col("c1a").cast("double") *
            col("c1b").cast("double"))), 4))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        col("c12"), col("pmi"))
      .orderBy(desc("pmi"), col("bigram"))
      .limit(20)
  }

  val q107Sql: String =
    """WITH d AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
      |  FROM documents
      |), uni AS (SELECT unnest(l) AS w FROM d),
      |uc AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
      |bg AS (SELECT unnest(list_transform(range(1, len(l)),
      |         i -> {'w1': l[i], 'w2': l[i + 1]})) AS p FROM d),
      |bg2 AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM bg),
      |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg2 GROUP BY w1, w2
      |       HAVING count(*) >= 5),
      |stats AS (SELECT (SELECT count(*) FROM uni) AS t_uni,
      |                 (SELECT count(*) FROM bg2) AS t_big)
      |SELECT w1 || ' ' || w2 AS bigram, c12,
      |       round(ln(c12::DOUBLE * t_uni::DOUBLE * t_uni::DOUBLE
      |         / (t_big::DOUBLE * a.c1::DOUBLE * b.c1::DOUBLE)), 4) AS pmi
      |FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w
      |CROSS JOIN stats
      |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin

  // q108 — SimHash fingerprints with an EXACT ORACLE (round 16): the
  // production simhash (TextOps — xxhash64-based, 64-bit, banded
  // blocking) is test-only because xxhash64 has no DuckDB twin; this
  // variant derives a 32-bit simhash from md5 — identical lowercase hex
  // in both engines — so the dedup family's last member gains a
  // hash-matched row. Per (doc, bit): majority vote of the bit across
  // the doc's token hashes (ties set the bit — `>= 0`). Cross-engine
  // arithmetic discipline: hex nibble via instr, bit via
  // floor-divide-then-CAST (never CAST(double) directly — DuckDB
  // ROUNDS where Spark truncates), recombine via power(2,b) cast to
  // BIGINT (exact ≤ 2^52). Scale shape: one explode × a broadcast
  // 32-row bit table → two hash aggregates; no window, no sort wider
  // than the final presentation ORDER BY.
  def q108(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .select(col("doc_id"), md5(col("t")).as("h"))
    val bits = s.range(0, 32).toDF("b")
    toks.crossJoin(broadcast(bits))
      .withColumn("w_term", expr(
        "2 * (CAST(floor((instr('0123456789abcdef', substring(h, " +
        "CAST(floor(b / 4.0) AS INT) + 1, 1)) - 1) / power(2, b % 4)) " +
        "AS INT) % 2) - 1"))
      .groupBy("doc_id", "b").agg(sum(col("w_term")).as("w"))
      .groupBy("doc_id")
      .agg(sum(when(col("w") >= 0, expr("CAST(power(2, b) AS BIGINT)"))
        .otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  val q108Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, md5(t) AS h FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
      |  ) WHERE t <> ''
      |), bits AS (SELECT unnest(range(0, 32)) AS b),
      |bw AS (
      |  SELECT doc_id, b,
      |    sum(2 * (CAST(floor((instr('0123456789abcdef',
      |        substring(h, CAST(floor(b / 4.0) AS INT) + 1, 1)) - 1)
      |        / power(2, b % 4)) AS INT) % 2) - 1) AS w
      |  FROM toks CROSS JOIN bits GROUP BY doc_id, b
      |)
      |SELECT doc_id,
      |  sum(CASE WHEN w >= 0 THEN CAST(power(2, b) AS BIGINT)
      |      ELSE 0 END)::BIGINT AS simhash
      |FROM bw GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_bm25"           -> (q105 _),
    "q107_pmi_collocations" -> (q107 _),
    "q108_simhash"        -> (q108 _),
    "q90_vocab_topk"      -> (q90 _),
    "q41_cosine_near_dup" -> (q41 _),
    "q42_ngram_jaccard"   -> (q42 _),
    "q43_token_counts"    -> (q43 _),
    "q44_quality_score"   -> (q44 _),
    "q53_stopword_filter" -> (q53 _),
    "q55_stratified_sample" -> (q55 _),
    "q56_sequence_pack"     -> (q56 _),
    "q57_weighted_mixture"  -> (q57 _),
    "q59_contamination"     -> (q59 _),
    "q60_global_sample"     -> (q60 _),
    "q79_repetition"        -> (q79 _),
    "q87_chunk_windows"     -> (q87 _),
    "q88_df_prune"          -> (q88 _))

  val oracle: Map[String, String] = Map(
    "q105_bm25"           -> q105Sql,
    "q107_pmi_collocations" -> q107Sql,
    "q108_simhash"        -> q108Sql,
    "q90_vocab_topk"      -> q90Sql,
    "q41_cosine_near_dup" -> q41Sql,
    "q42_ngram_jaccard"   -> q42Sql,
    "q43_token_counts"    -> q43Sql,
    "q44_quality_score"   -> q44Sql,
    "q53_stopword_filter" -> q53Sql,
    "q55_stratified_sample" -> q55Sql,
    "q56_sequence_pack"     -> q56Sql,
    "q57_weighted_mixture"  -> q57Sql,
    "q59_contamination"     -> q59Sql,
    "q60_global_sample"     -> q60Sql,
    "q79_repetition"        -> q79Sql,
    "q87_chunk_windows"     -> q87Sql,
    "q88_df_prune"          -> q88Sql)
}
