package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.9 llm_minhash_lsh)
  * — the 100 TB-scale replacement for all-pairs Jaccard (q33):
  *
  *   1. shingle each document (word n-grams),
  *   2. k independent min-hashes per doc  →  signature (estimates Jaccard:
  *      P[minhash_i(A) = minhash_i(B)] = J(A,B)),
  *   3. band the signature (b bands × r rows, k = b·r); docs sharing any
  *      band key are candidate pairs,
  *   4. estimate J from signature agreement on candidates only.
  *
  * Cost model: O(n·k) signature computation + a groupBy on band keys +
  * bucket-local pair generation — versus O(n²) for brute force. With
  * b=16, r=4 the candidate-recall S-curve crosses ~0.5 at
  * J ≈ (1/b)^(1/r) ≈ 0.5, the standard near-dup operating point.
  *
  * Implementation is pure codegen'd column expressions — the k min-hashes
  * are ONE aggregation over the exploded shingles using elementwise
  * array-min (`zip_with greatest/least` is interpreted, so we use k
  * explicit min(...) aggregate columns, which each stay in the fast
  * two-phase hash-agg path). The per-shingle hash family is
  * h_i(s) = xxhash64(s, seed_i) via Spark's seedable xxhash64.
  */
object MinHashLsh {

  /** doc_id + sorted distinct word n-gram shingles, exploded (one row per
    * (doc_id, shingle)).
    *
    * Docs with fewer than n words produce NO shingles by default (they
    * have no n-gram; downstream they carry a null signature and are
    * treated as unique — the streaming ingest gate's documented
    * contract). `shortDocWhole = true` opts into the production
    * fallback instead: a short doc contributes its WHOLE text as one
    * shingle, so two byte-identical short docs still produce identical
    * signatures (collide in every band → estimated Jaccard 1.0 → caught
    * by dedup) while distinct short docs share nothing and never
    * false-pair. The fallback changes no ≥n-word doc's shingles.
    */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
               textCol: String = "text",
               shortDocWhole: Boolean = false): DataFrame = {
    val words = split(col(textCol), " ")
    // word n-grams via transform over a 0..len-n index range
    val grams = expr(
      s"""transform(sequence(0, greatest(size(split($textCol, ' ')) - $n, 0)),
         |  i -> array_join(slice(split($textCol, ' '), i + 1, $n), ' '))""".stripMargin)
    if (shortDocWhole)
      // NULL text stays invisible (no shingle → null signature → unique):
      // without this filter every null-text doc would shingle to a NULL
      // token, and xxhash64 SKIPS null arguments — all null-text docs
      // would share one signature and mass-dedup against each other
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol),
          explode(array_distinct(
            when(size(words) >= n, grams).otherwise(array(col(textCol)))))
            .as("shingle"))
    else
      docs
        .filter(size(words) >= n)
        .select(col(idCol), explode(array_distinct(grams)).as("shingle"))
  }

  /** k-column MinHash signature per doc: row per doc_id, columns mh_0..mh_{k-1}. */
  def signatures(sh: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** One row per (id, band, key): the signature banded into `bands` keys
    * of `rowsPerBand` components each — the LSH bucketing both the
    * self-join ([[candidatePairs]]) and the cross-frame join
    * ([[crossPairsAboveThreshold]]) hang off.
    */
  private def bandKeys(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                       idCol: String): DataFrame = {
    val keys = (0 until bands).map { bIdx =>
      val cols = (bIdx * rowsPerBand until (bIdx + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(bIdx).as("band"), hash(cols: _*).as("key")).as(s"bk_$bIdx")
    }
    sigs
      .select(col(idCol), explode(array(keys: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.key"))
  }

  /** Candidate pairs from LSH banding: (id_a, id_b) sharing ≥1 of the
    * `bands` band keys. Dedup across bands included.
    */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                     idCol: String = "doc_id"): DataFrame = {
    val banded = bandKeys(sigs, bands, rowsPerBand, idCol)
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"), col(idCol).as("id_b"))
    a.join(b, col("band") === col("band_b") && col("key") === col("key_b") &&
              col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Cross-frame near-dup pairs: (id_a ∈ `a`, id_b ∈ `b`) sharing ≥1 LSH
    * band key, kept where the signature-estimated Jaccard ≥ `threshold`.
    * Unlike [[candidatePairs]] this never pairs within one frame and makes
    * no assumption about the two id spaces — the shape a streaming ingest
    * needs to test an arriving micro-batch against the accepted history
    * (bucketed equi-join on band keys, never all-pairs; the snapshot side
    * carries persisted signatures so history is never re-shingled).
    */
  def crossPairsAboveThreshold(a: DataFrame, b: DataFrame, k: Int, bands: Int,
                               threshold: Double,
                               idCol: String = "doc_id"): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    val ba = bandKeys(a, bands, r, idCol)
      .select(col(idCol).as("id_a"), col("band"), col("key"))
    val bb = bandKeys(b, bands, r, idCol)
      .select(col(idCol).as("id_b"), col("band").as("band_b"), col("key").as("key_b"))
    val pairs = ba.join(bb, col("band") === col("band_b") && col("key") === col("key_b"))
      .select("id_a", "id_b").distinct()
    val sa = a.select(col(idCol).as("id_a"),
      array((0 until k).map(i => col(s"mh_$i")): _*).as("sig_a"))
    val sb = b.select(col(idCol).as("id_b"),
      array((0 until k).map(i => col(s"mh_$i")): _*).as("sig_b"))
    val agree = expr(
      """aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    pairs
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / lit(k)).as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
  }

  /** Jaccard estimate on candidate pairs: fraction of the k signature
    * components that agree.
    */
  def estimateJaccard(pairs: DataFrame, sigs: DataFrame, k: Int,
                      idCol: String = "doc_id"): DataFrame = {
    val sigArr = sigs.select(col(idCol),
      array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"))
    val agree = expr(
      """aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    pairs
      .join(sigArr.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigArr.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / lit(k)).as("jaccard_est"))
  }

  /** End-to-end near-dup pipeline: docs → candidate pairs with estimated
    * Jaccard ≥ threshold, ordered deterministically. `shortDocWhole`
    * opts short docs into whole-text-shingle dedup (see [[shingles]]).
    */
  def nearDuplicates(docs: DataFrame, n: Int = 5, k: Int = 64,
                     bands: Int = 16, threshold: Double = 0.5,
                     shortDocWhole: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val sh = shingles(docs, n, shortDocWhole = shortDocWhole)
    // signatures feed BOTH banding and estimation — materialize once via
    // LAZY localCheckpoint rather than cache(): checkpoint blocks belong
    // to the plan and are reclaimed by the ContextCleaner when the result
    // frame is dropped (a cache() here would pin blocks in the cache
    // manager for the app lifetime with no handle to release them), and
    // eager=false keeps this function lazy — the signature job runs on the
    // caller's first action, not at DataFrame construction
    val sigs = signatures(sh, k).localCheckpoint(eager = false)
    val pairs = candidatePairs(sigs, bands, k / bands)
    estimateJaccard(pairs, sigs, k)
      .filter(col("jaccard_est") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
