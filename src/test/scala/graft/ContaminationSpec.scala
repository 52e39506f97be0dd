package graft

import org.apache.spark.sql.functions._
import graft.engine.{Tables, Training}

/** Contamination scan + decontamination: planted-overlap shapes, threshold
  * behavior, and equivalence with the declared q59 on the fixture split.
  */
class ContaminationSpec extends SparkSpecBase {
  import spark.implicits._

  private val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 words

  test("planted 8-gram overlap is flagged with the exact shared-gram count") {
    val corpus = Seq(
      (1L, s"prefix words here $span suffix tail"),       // contains the span
      (2L, "totally unrelated content with many words repeated many times"),
      (3L, "alpha beta gamma delta epsilon zeta eta")     // only 7 words — no 8-gram
    ).toDF("doc_id", "text")
    val test = Seq((100L, s"held out doc embedding $span inside it")).toDF("doc_id", "text")
    val hits = Training.contamination(corpus, test)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares exactly the one 8-gram of the span; 2 and 3 are clean
    assert(hits == Map(1L -> 1L), hits.toString)
  }

  test("longer verbatim overlap raises the count; minShared thresholds it") {
    val nineWords = span + " iota" // 9 words = two overlapping 8-grams
    val corpus = Seq(
      (1L, s"a b $nineWords c d"),
      (2L, s"x y $span z w")      // one 8-gram only
    ).toDF("doc_id", "text")
    val test = Seq((100L, s"eval doc with $nineWords end")).toDF("doc_id", "text")
    val hits = Training.contamination(corpus, test)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L), hits.toString)
    // minShared = 2 drops only the heavily-contaminated doc
    val kept = Training.decontaminate(corpus, test, minShared = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), kept.toString)
    // default minShared = 1 drops both
    val keptStrict = Training.decontaminate(corpus, test)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptStrict == Set.empty[Long], keptStrict.toString)
  }

  test("generic operator ≡ declared q59 on the fixture's id split") {
    val docs = Tables.documents(spark, sf001)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val corpus = docs.filter(col("doc_id") * 10 <= maxId * 9)
    val test = docs.filter(col("doc_id") * 10 > maxId * 9)
    val generic = Training.contamination(corpus, test)
      .orderBy("doc_id").collect().toSeq
    val declared = Training.q59(spark, sf001).collect().toSeq
    assert(generic == declared)
    // and decontaminate removes exactly the flagged docs
    val flagged = declared.map(_.getLong(0)).toSet
    val kept = Training.decontaminate(corpus, test)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == corpus.select("doc_id").collect().map(_.getLong(0)).toSet -- flagged)
  }
}
