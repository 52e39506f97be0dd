package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring (round 8b) — the CCNet /
  * Gopher-style quality filter every pretraining pipeline runs: train a
  * small bigram LM on a reference corpus, score candidate documents by
  * perplexity under it, and keep the low-perplexity (reference-like)
  * tail. Gibberish, boilerplate and wrong-language text score high and
  * get cut.
  *
  * Design for 100 TB:
  *  - TRAINING is two map-side-combinable count aggregations (unigrams,
  *    bigrams) over the reference corpus, capped to a top-K vocabulary —
  *    one pass, two shuffles on token keys, output is a model TABLE of
  *    at most K + bigram-cap rows (KBs–MBs), not a driver structure.
  *  - SCORING explodes candidate docs to bigrams and joins the model
  *    table — the model side is small by construction, so the join
  *    BROADCASTS and scoring is scan-speed with one final per-doc agg.
  *    No UDFs anywhere: tokenize/pair/log arithmetic are codegen'd
  *    built-ins.
  *  - Smoothing is Laplace over the closed vocab + UNK, so every bigram
  *    (seen or not) has positive probability: log p(w2|w1) =
  *    log(c(w1,w2) + 1) − log(c(w1) + V + 1). Out-of-vocab tokens map
  *    to UNK before lookup — the model generalizes instead of scoring
  *    unseen-token docs infinitely bad.
  *
  * Perplexity = exp(−Σ log p / n) over a doc's n bigrams; docs shorter
  * than one bigram get NULL (no evidence either way — the caller
  * decides, same contract as MinHash's short docs).
  */
object Perplexity {

  private val Unk = "UNK"
  // reserved w2 marking a CONTEXT-FLOOR row in the model table: real
  // tokens are lowercased by the tokenizer, so the uppercase sentinel
  // cannot collide (the same trick UNK relies on)
  private val CtxTok = "CTXFLOOR"

  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^\\p{L}\\p{N}']+"), t => length(t) > 0)

  /** Train a bigram LM on `ref`: returns (w1, w2, logp) — at most
    * `bigramCap` rows plus per-w1 context counts folded in, broadcastable
    * by construction. `vocabK` caps the unigram vocabulary; everything
    * rarer becomes UNK (including at score time, so train and score see
    * the same token space).
    */
  def train(ref: DataFrame, textCol: String = "text",
            vocabK: Int = 5000, bigramCap: Int = 200000): DataFrame = {
    val toks = ref.select(explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabK)
      .select("tok")
    // map rare tokens to UNK, THEN count bigrams over the closed space
    // sequence(1, n-1) flips DESCENDING when n < 2 (Spark's default
    // negative step) — guard sub-bigram rows to an empty array
    val mapped = ref.select(tokens(col(textCol)).as("ts"))
      .select(explode(expr(
        """CASE WHEN size(ts) >= 2
          |  THEN transform(sequence(1, size(ts) - 1),
          |                 i -> struct(ts[i-1] AS w1, ts[i] AS w2))
          |  ELSE array() END""".stripMargin)).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .join(broadcast(vocab.withColumnRenamed("tok", "w1")
        .withColumn("in1", lit(true))), Seq("w1"), "left")
      .join(broadcast(vocab.withColumnRenamed("tok", "w2")
        .withColumn("in2", lit(true))), Seq("w2"), "left")
      .select(
        when(col("in1").isNotNull, col("w1")).otherwise(lit(Unk)).as("w1"),
        when(col("in2").isNotNull, col("w2")).otherwise(lit(Unk)).as("w2"))
    val bigrams = mapped.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(bigramCap)
    val contexts = mapped.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = vocabK + 1 // closed vocab + UNK
    val seen = bigrams.join(contexts, "w1")
      .select(col("w1"), col("w2"),
        (log(col("c12") + lit(1.0)) - log(col("c1") + lit(v.toDouble)))
          .as("logp"))
    // PER-CONTEXT Laplace floors, one row per w1: an unseen bigram in a
    // frequent context must score log(1 / (c1 + V)) — a single global
    // floor would hand unseen continuations of common words MORE
    // probability than their rare SEEN continuations, inverting the
    // quality ranking exactly at the margin a threshold cuts
    val floors = contexts.select(col("w1"), lit(CtxTok).as("w2"),
      (-log(col("c1") + lit(v.toDouble))).as("logp"))
    seen.unionByName(floors)
  }

  /** Per-document perplexity of `docs` under a [[train]]ed model.
    * Unseen bigrams back off to the Laplace floor for their context
    * (or the global floor when even the context is unseen). Output:
    * the doc id column + `ppl` (NULL for docs with no bigram).
    */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", vocabK: Int = 5000): DataFrame = {
    val v = vocabK + 1
    val floors = model.filter(col("w2") === lit(CtxTok))
      .select(col("w1"), col("logp").as("ctx_floor"))
    val bigModel = model.filter(col("w2") =!= lit(CtxTok))
    // score-side token space = the model's own (w1 ∪ w2) — tokens that
    // survived training; anything else maps to UNK exactly like training
    val vocab = bigModel.select(col("w2").as("tok"))
      .union(model.filter(col("w2") =!= lit(CtxTok))
        .select(col("w1").as("tok")))
      .union(floors.select(col("w1").as("tok"))).distinct()
    val bg = docs.select(col(idCol), tokens(col(textCol)).as("ts"))
      .select(col(idCol), explode(expr(
        """CASE WHEN size(ts) >= 2
          |  THEN transform(sequence(1, size(ts) - 1),
          |                 i -> struct(ts[i-1] AS w1, ts[i] AS w2))
          |  ELSE array() END""".stripMargin)).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
      // the same UNK mapping the trainer applied
      .join(broadcast(vocab.withColumnRenamed("tok", "w1")
        .withColumn("in1", lit(true))), Seq("w1"), "left")
      .join(broadcast(vocab.withColumnRenamed("tok", "w2")
        .withColumn("in2", lit(true))), Seq("w2"), "left")
      .select(col(idCol),
        when(col("in1").isNotNull, col("w1")).otherwise(lit(Unk)).as("w1"),
        when(col("in2").isNotNull, col("w2")).otherwise(lit(Unk)).as("w2"))
    // fallback ladder: seen bigram → its context's Laplace floor →
    // the global unseen-context floor log(1 / V)
    val globalFloor = -math.log(v.toDouble)
    val scored = bg.join(broadcast(bigModel), Seq("w1", "w2"), "left")
      .join(broadcast(floors), Seq("w1"), "left")
      .select(col(idCol),
        coalesce(col("logp"), col("ctx_floor"), lit(globalFloor)).as("lp"))
      .groupBy(idCol)
      .agg(exp(-avg(col("lp"))).as("ppl"))
    // sub-bigram docs never exploded a row — reattach them with NULL
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Train on `ref`, score `docs`, one call — the filter shape:
    * `perplexity(docs, ref).filter($"ppl" < threshold)`.
    */
  def perplexity(docs: DataFrame, ref: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", vocabK: Int = 5000): DataFrame = {
    val m = train(ref, textCol, vocabK).localCheckpoint(eager = false)
    score(docs, m, idCol, textCol, vocabK)
  }
}
