package graft

import org.apache.spark.sql.functions._
import graft.engine.{LlmOps, MinHashLsh, Tables}

/** MinHash+LSH near-dup: estimator sanity, error bound vs exact Jaccard
  * (SURVEY §5.2.3), and dedup idempotence for q31.
  */
class MinHashLshSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical documents get identical signatures and est ~ 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated to anything else here now")
    ).toDF("doc_id", "text")
    val out = MinHashLsh.nearDuplicates(docs, n = 3, k = 64, bands = 16, threshold = 0.9)
      .collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
    assert(out.head.getDouble(2) == 1.0)
  }

  test("near-identical documents (one word changed) are caught at 0.5 threshold") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("theta", "changed")),
      (3L, "nothing in common with the others at all in any way shape or form")
    ).toDF("doc_id", "text")
    val pairs = MinHashLsh.nearDuplicates(docs, n = 3, k = 64, bands = 16, threshold = 0.3)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("estimator tracks exact Jaccard within MinHash error bound on fixtures") {
    // exact Jaccard (q33 logic, word 3-shingles) vs the k=64 estimate on
    // candidate pairs from sf0.001 documents. E[err] ~ 1/sqrt(k) = 0.125;
    // assert mean abs error < 0.15 and max < 0.35 over candidates.
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val sh = MinHashLsh.shingles(docs, 3)
    val sigs = MinHashLsh.signatures(sh, 64)
    val cands = MinHashLsh.candidatePairs(sigs, 16, 4)
    val est = MinHashLsh.estimateJaccard(cands, sigs, 64)
    val t = sh.distinct()
    val sizes = t.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = t.select(col("doc_id").as("id_a"), col("shingle"))
      .join(t.select(col("doc_id").as("id_b"), col("shingle").as("s2")),
        col("shingle") === col("s2") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    val exact = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common"))).as("jac"))
    val joined = est.join(exact, Seq("id_a", "id_b"), "left")
      .select(col("jaccard_est"), coalesce(col("jac"), lit(0.0)).as("jac"))
      .collect()
    assert(joined.nonEmpty, "no candidate pairs found at sf0.001")
    val errs = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.sum / errs.length < 0.15, s"mean error ${errs.sum / errs.length}")
    assert(errs.max < 0.35, s"max error ${errs.max}")
  }

  test("crossPairsAboveThreshold: cross-frame pairs only, agrees with the self-join formulation") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val corpus = Seq(
      (1L, base),
      (2L, base.replace("theta", "changed")),
      (3L, "nothing in common with the others at all in any way shape or form"),
      (4L, base), // identical to 1 — the planted cross-frame near-dup
      (5L, "a totally separate subject matter discussed in this very different document")
    ).toDF("doc_id", "text")
    val k = 64; val bands = 16; val thr = 0.5
    val sigs = MinHashLsh.signatures(MinHashLsh.shingles(corpus, 3), k)
    val aIds = Set(1L, 3L); val bIds = Set(2L, 4L, 5L)
    val a = sigs.filter(col("doc_id").isin(aIds.toSeq: _*))
    val b = sigs.filter(col("doc_id").isin(bIds.toSeq: _*))
    val cross = MinHashLsh.crossPairsAboveThreshold(a, b, k, bands, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // orientation is (id_a ∈ a, id_b ∈ b); never a pair within one frame —
    // note 2 and 4 ARE near-dups inside frame b and must not be emitted
    assert(cross.forall { case (x, y) => aIds(x) && bIds(y) }, cross.toString)
    assert(cross.contains((1L, 4L)))
    // agrees exactly with candidatePairs+estimateJaccard on the shared id
    // space, restricted to pairs straddling the two frames
    val self = MinHashLsh
      .estimateJaccard(MinHashLsh.candidatePairs(sigs, bands, k / bands), sigs, k)
      .filter(col("jaccard_est") >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = self.flatMap { case (x, y) =>
      if (aIds(x) && bIds(y)) Some((x, y))
      else if (aIds(y) && bIds(x)) Some((y, x))
      else None
    }
    assert(cross == expected, s"cross=$cross expected=$expected")
  }

  test("shortDocWhole: identical short docs dedupe, distinct ones never false-pair") {
    val s0 = spark; import s0.implicits._
    val docs = Seq(
      (1L, "tiny doc"),                       // < n words: no n-gram exists
      (2L, "tiny doc"),                       // byte-identical short dup
      (3L, "different tiny"),                 // short but distinct
      (4L, "a b c d e f g h i j k l m n o"), // long doc, normal shingling
      (5L, "a b c d e f g h i j k l m n o")  // its exact dup
    ).toDF("doc_id", "text")
    // default contract: short docs have no signature and are invisible
    val defaults = MinHashLsh.nearDuplicates(docs, n = 5, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaults == Set((4L, 5L)), defaults.toString)
    // fallback: the whole text is the one shingle — identical short docs
    // collide in every band; distinct short docs share nothing; long-doc
    // shingling is unchanged
    val whole = MinHashLsh.nearDuplicates(docs, n = 5, threshold = 0.9,
      shortDocWhole = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(whole == Set((1L, 2L), (4L, 5L)), whole.toString)

    // NULL text must stay invisible even with the fallback on — xxhash64
    // SKIPS null arguments, so null-text docs would otherwise all share
    // one signature and mass-dedup against each other
    val withNulls = docs.unionByName(
      Seq((6L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val nullSafe = MinHashLsh.nearDuplicates(withNulls, n = 5,
      threshold = 0.9, shortDocWhole = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nullSafe == Set((1L, 2L), (4L, 5L)),
      s"null-text docs must never pair: $nullSafe")
  }

  test("q31 exact dedup is idempotent") {
    val once = LlmOps.q31(spark, sf0001)
    // dedup of the dedup keeper set: every keeper maps to itself
    val again = once.select(col("keeper_id")).distinct().count()
    assert(again == once.count())
  }
}
