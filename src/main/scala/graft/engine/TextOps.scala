package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (task brief +
  * SURVEY.md §2.9): SimHash near-dup fingerprints, rolling-hash document
  * fingerprinting, BPE-ish token counting, heuristic language ID, and
  * quality scoring. Everything is built-in column expressions — per-row,
  * embarrassingly parallel, no shuffle except where aggregation is the
  * point — so all of it runs at scan speed on 100 TB.
  */
object TextOps {

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: bit i of the fingerprint is the
    * majority vote of bit i across the tokens' xxhash64 values. Docs with
    * small Hamming distance between fingerprints are near-duplicates.
    * df + `simhash` column computed from `textCol`.
    */
  def withSimhash(df: DataFrame, textCol: String = "text"): DataFrame =
    // token hashes computed ONCE into an array; the 64 bit-count folds then
    // run over the cached hashes, not 64 re-tokenize + re-hash passes
    df.withColumn("__simhash_hashes",
        expr(s"transform(split($textCol, ' '), t -> xxhash64(t))"))
      .withColumn("__simhash_counts", expr(
        """transform(sequence(0, 63), b ->
          |  aggregate(__simhash_hashes, 0L,
          |    (acc, h) -> acc + IF((shiftright(h, b) & 1L) = 1L, 1L, 0L)))"""
          .stripMargin))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
          |  IF(__simhash_counts[b] * 2 > size(__simhash_hashes),
          |     acc | shiftleft(1L, b), acc))""".stripMargin))
      .drop("__simhash_hashes", "__simhash_counts")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4×16-bit fingerprint chunks
    * (a pair within Hamming distance ≤ 3 of a 64-bit fingerprint must agree
    * exactly on at least one of 4 chunks — pigeonhole), then verify with
    * full Hamming distance. Same LSH-shaped cost profile as MinHash.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is only complete for distance <= 3")
    val fp = withSimhash(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("simhash"))
    val chunked = fp.select(col(idCol), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3), c ->
          |  named_struct('chunk', c, 'key', shiftright(simhash, c * 16) & 65535L))"""
          .stripMargin)).as("ck"))
      .select(col(idCol), col("simhash"), col("ck.chunk"), col("ck.key"))
    val a = chunked.select(col("chunk"), col("key"),
      col(idCol).as("id_a"), col("simhash").as("fp_a"))
    val b = chunked.select(col("chunk").as("chunk_b"), col("key").as("key_b"),
      col(idCol).as("id_b"), col("simhash").as("fp_b"))
    a.join(b, col("chunk") === col("chunk_b") && col("key") === col("key_b") &&
              col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------- fingerprint / tokenization

  /** Deterministic rolling hash over word tokens — chained
    * h = xxhash64(h, token), so it is order-sensitive (unlike set-based
    * MinHash) and never overflows (ANSI mode rejects wrapping multiply).
    */
  def fingerprint(textColName: String): Column =
    expr(s"aggregate(split($textColName, ' '), 0L, (acc, t) -> xxhash64(acc, t))")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (the standard pre-tokenizer shape).
    */
  def tokenCountBpe(textColName: String): Column =
    size(expr(s"regexp_extract_all($textColName, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column =
    size(split(textCol, "\\s+"))

  // ------------------------------------------------------------ language ID

  /** Tiny per-language marker lexicons for the heuristic language ID.
    * Real pipelines use char-n-gram models (fastText et al.); the marker-
    * word argmax is the dependency-free stand-in with the same Spark shape:
    * per-row scoring against broadcast-able reference data.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "en", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "dans", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Heuristic language ID: argmax over marker-token hit counts, "und"
    * (undetermined) when nothing scores. Token membership via array_intersect
    * on lowered tokens — codegen'd, no UDF, no external model.
    */
  def langId(textCol: Column): Column = {
    val toks = split(lower(textCol), "[\\s\\p{Punct}]+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val markers = array(words.map(lit): _*)
      struct(size(array_intersect(toks, markers)).as("score"), lit(lang).as("lang"))
    }
    // argmax: array_max on (score, lang) structs orders by score then lang
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // -------------------------------------------------------- quality scoring

  /** Heuristic document-quality features + composite score (the Gopher/C4
    * -style filters): length, token stats, alpha/punct ratios, stopword
    * ratio, repetition ratio. Returns df + feature columns + `quality`.
    */
  def withQualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, "\\s+")
    val en = array(langMarkers("en").map(lit): _*)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("avg_token_len",
        when(size(toks) > 0, length(regexp_replace(t, "\\s+", "")).cast("double") / size(toks))
          .otherwise(0.0))
      .withColumn("alpha_ratio",
        when(length(t) > 0,
          length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("stopword_ratio",
        when(size(toks) > 0,
          size(array_intersect(transform(toks, x => lower(x)), en)).cast("double") / size(toks))
          .otherwise(0.0))
      .withColumn("dedup_token_ratio",
        when(size(toks) > 0,
          size(array_distinct(toks)).cast("double") / size(toks)).otherwise(0.0))
      .withColumn("quality",
        // bounded [0,1]: reward mid-length docs, alphabetic text, low
        // punctuation noise, lexical diversity
        round(least(lit(1.0),
          (least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.3) +
          (col("alpha_ratio") * 0.3) +
          ((lit(1.0) - col("punct_ratio")) * 0.1) +
          (col("dedup_token_ratio") * 0.3)), 6))
  }

  /** PII redaction at scan speed — the standard pre-training scrub pass.
    * Chained codegen'd regexp_replace; each pattern stays in the Java∩RE2
    * common subset (no lookarounds/backrefs) so the same rules port to
    * RE2-based engines. Order matters: cards before phones (a 16-digit
    * card must not half-match the phone rule), emails before bare domains.
    * Patterns are intentionally high-recall/imperfect-precision — scrubbing
    * over-redacts by design; precision cases are asserted in TextOpsSpec.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val card = "\\b(?:\\d[ -]?){15}\\d\\b"
    val phone = "\\+?\\d{1,3}[-. (]{0,2}\\d{2,4}[-. )]{0,2}\\d{3,4}[-. ]?\\d{3,4}\\b"
    val ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val t0 = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t0, email, "[EMAIL]"),
              card, "[CARD]"),
            ssn, "[SSN]"),
          ipv4, "[IP]"),
        phone, "[PHONE]")
    df.withColumn("text_redacted", redacted)
      .withColumn("was_redacted", redacted =!= t0)
  }

  // -------------------------------------------- compression-ratio quality

  /** deflate(text)/len(text) as a quality signal: highly repetitive or
    * templated documents compress far below natural prose (the
    * compression-ratio filter used alongside the Gopher rules — it
    * catches repetition that q79's in-document token ratio misses, e.g.
    * long-period boilerplate). Ratio ≥ ~1.0 ⇒ incompressible (random or
    * very short); ≪ 1 ⇒ repetitive. NULL text → NULL ratio (a fact, not
    * a failure). Uses the JVM's Deflater via mapPartitions — the
    * documented codec exception to the no-UDF rule (Multimodal
    * precedent): one Deflater per partition, reset per row, explicitly
    * `end()`ed so native zlib memory never waits on the GC.
    */
  def withCompressionRatio(df: DataFrame, textCol: String = "text",
                           outCol: String = "compression_ratio"): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.DoubleType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED, /*nowrap=*/ true)
      // native zlib memory must not depend on the consumer draining the
      // iterator: a limit/take (or a killed task) stops mid-stream and the
      // drain-detecting wrapper below never fires — the task-completion
      // listener is the release that always runs. end() is idempotent, so
      // the fast path (full drain) releasing early is safe.
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](8192)
      val out = rows.map { r =>
        val ratio: Any = r.get(idx) match {
          case s: String if s.nonEmpty =>
            val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var compressed = 0L
            while (!deflater.finished())
              compressed += deflater.deflate(buf)
            compressed.toDouble / bytes.length
          case s: String => 1.0 // empty text: nothing to compress
          case _ => null
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ ratio)
      }
      // the iterator is fully drained by the writer before the task ends;
      // wrap so end() runs exactly once afterwards
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) deflater.end()
          h
        }
        def next(): org.apache.spark.sql.Row = out.next()
      }
    }(enc)
  }

  // ------------------------------------------------ unicode normalization

  /** NFKC-normalize a text column (java.text.Normalizer): fullwidth
    * forms, ligatures, compatibility codepoints and combining sequences
    * fold to canonical equivalents — the standard pre-tokenization
    * cleanup so "ﬁle" and "file" (or fullwidth digits) dedup and
    * tokenize identically. Spark has no built-in normalizer expression,
    * so this is a scalar UDF by necessity (udf_surface policy: UDF only
    * when no built-in exists); NULL passes through.
    */
  def withNfkc(df: DataFrame, textCol: String = "text",
               outCol: String = "text_nfkc"): DataFrame = {
    val nfkc = udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    }
    df.withColumn(outCol, nfkc(col(textCol)))
  }
}
