package graft

import org.apache.spark.sql.functions._
import graft.engine.{Perplexity, Tables}

/** The CCNet/Gopher-style perplexity quality filter: a bigram LM
  * trained on a reference corpus must rank reference-like text below
  * gibberish, the whole pipeline must be deterministic (it decides what
  * enters a training set), and scoring must broadcast the model — never
  * shuffle the corpus against it.
  */
class PerplexitySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ref = Tables.documents(spark, sf001).select("doc_id", "text")

  test("reference-like text scores below gibberish under the reference LM") {
    val model = Perplexity.train(ref, vocabK = 2000).cache()
    // candidates: real sentences drawn from the same corpus vs strings
    // the reference distribution has never seen
    val real = ref.limit(20).select(col("doc_id"), col("text"))
    val gibberish = Seq(
      (900001L, "zqx vrk jwp nls xkcd qqwz plmf zzyx vgbh njkl wqer"),
      (900002L, "xj qv zz kk pp ww rr tt yy uu ii oo aa ss dd ff"),
      (900003L, "lorem zxqv ipsum wkrp dolor qqzz amet vvbb elitr ppmm")
    ).toDF("doc_id", "text")
    val scored = Perplexity.score(real.unionByName(gibberish), model,
      vocabK = 2000).cache()
    val realMax = scored.join(real.select("doc_id"), "doc_id")
      .agg(max("ppl")).head().getDouble(0)
    val gibMin = scored.join(gibberish.select("doc_id"), "doc_id")
      .agg(min("ppl")).head().getDouble(0)
    assert(gibMin > realMax,
      s"gibberish must out-perplex every reference doc: gib=$gibMin real=$realMax")
    scored.unpersist(); model.unpersist()
  }

  test("per-context floor: unseen continuations of a common word never beat rare SEEN ones") {
    // context "the" occurs far more often than V: under a single GLOBAL
    // floor, an UNSEEN bigram after "the" would get MORE probability
    // than the rare but OBSERVED "the dog" — inverting the filter at
    // exactly the margin a threshold cuts. The per-context Laplace
    // floor log(1/(c1+V)) restores the order.
    val refRows = Seq.fill(3000)("the cat sat on the mat") ++
      Seq("the dog barked") ++ Seq("zebras exist here too")
    val refDf = refRows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Perplexity.train(refDf, vocabK = 10)
    val probe = Seq(
      (1L, "the dog"),  // RARE but seen bigram
      (2L, "the zebras") // both tokens known, bigram UNSEEN
    ).toDF("doc_id", "text")
    val ppl = Perplexity.score(probe, model, vocabK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl(2L) > ppl(1L),
      s"unseen continuation must out-perplex the rare seen one: $ppl")
  }

  test("deterministic: two full runs produce identical scores") {
    val docs = ref.limit(50)
    val a = Perplexity.perplexity(docs, ref, vocabK = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Perplexity.perplexity(docs, ref, vocabK = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b, "perplexity must be bit-deterministic across runs")
    assert(a.size == 50)
  }

  test("docs with no bigram score NULL; the model broadcasts, the corpus never shuffles against it") {
    val model = Perplexity.train(ref.limit(200), vocabK = 500)
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val out = Perplexity.score(docs, model, vocabK = 500)
    val byId = out.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L) && byId(2L) && !byId(3L),
      s"sub-bigram docs must score NULL: $byId")
    // plan shape: every MODEL-side join (on the gram keys w1/w2) is a
    // broadcast — the candidate corpus never sort-merges against the
    // model. The final per-doc NULL-reattach joins the corpus against
    // its own aggregate on doc_id; that one may shuffle.
    val plan = Perplexity.score(ref, model, vocabK = 500)
      .queryExecution.executedPlan.toString
    val smjOnGrams = plan.linesIterator
      .filter(_.contains("SortMergeJoin"))
      .filter(l => l.contains("w1") || l.contains("w2")).toSeq
    assert(plan.contains("BroadcastHashJoin") && smjOnGrams.isEmpty,
      s"model joins must broadcast:\n$plan")
  }
}
