package graft

import org.apache.spark.sql.functions._
import graft.engine.{Tables, Training}

/** q56's scale path (sequence packing within (source, hash sub-shard)):
  * the packing invariants must hold PER SUB-SHARD, every document must
  * land in exactly one chunk, and the sub-sharding must actually bound the
  * window partitions (the whole point — no single task sorts a source).
  * shards = 1 must degenerate to exactly q56's per-source packing.
  */
class SequencePackSpec extends SparkSpecBase {

  private val budget = 500
  private val shards = 8

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val assign = Training.packAssignments(docs, budget, shards).cache()

  test("chunk assignment matches an independent greedy re-pack per (source, shard)") {
    val rows = assign
      .select(col("source").cast("string"), col("shard").cast("int"),
        col("doc_id").cast("long"), col("n_tok").cast("long"),
        col("chunk_id").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((src, sh), grp) =>
      var before = 0L
      grp.sortBy(_._3).foreach { case (_, _, id, nTok, chunk) =>
        val expected = before / budget
        assert(chunk == expected,
          s"doc $id in ($src, shard $sh): chunk $chunk, expected $expected (tokens before: $before)")
        before += nTok
      }
    }
  }

  test("budget invariant per sub-shard: tokens-before-doc ∈ [chunk·budget, (chunk+1)·budget)") {
    val violations = assign
      .withColumn("before", col("cum") - col("n_tok"))
      .filter(col("before") < col("chunk_id") * budget ||
              col("before") >= (col("chunk_id") + 1) * budget)
      .count()
    assert(violations == 0L)
  }

  test("conservation: every doc packed exactly once, token totals preserved") {
    val packed = Training.sequencePackSharded(docs, budget, shards)
    val (nDocs, nTokens) = {
      val r = packed.agg(sum("n_docs"), sum("chunk_tokens")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(nDocs == docs.count())
    val directTokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(nTokens == directTokens)
    assert(assign.select("doc_id").distinct().count() == nDocs)
  }

  test("sub-sharding bounds every window partition below the per-source size") {
    val perShard = assign.groupBy("source", "shard").count()
      .collect().map(_.getLong(2))
    val perSource = assign.groupBy("source").count()
      .collect().map(_.getLong(1))
    val maxShard = perShard.max
    val maxSource = perSource.max
    assert(maxShard < maxSource,
      s"sharding must strictly shrink the largest window partition ($maxShard vs $maxSource)")
    // hash balance: no shard grossly above the even split
    val mean = perShard.sum.toDouble / perShard.length
    assert(maxShard <= mean * 3.0,
      s"worst shard $maxShard exceeds 3× the mean shard size $mean")
  }

  test("shards = 1 degenerates to exactly q56's per-source packing") {
    val sharded = Training.sequencePackSharded(docs, budget, shards = 1)
      .select(col("source"), col("chunk_id"), col("n_docs"), col("chunk_tokens"))
      .orderBy("source", "chunk_id").collect().toSeq
    val exact = Training.q56(spark, sf0001)
      .collect().toSeq
    assert(sharded == exact)
  }

  override def afterAll(): Unit = {
    assign.unpersist()
    super.afterAll()
  }
}
