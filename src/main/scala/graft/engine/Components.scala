package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph + canonical-per-cluster dedup —
  * the step after near-dup PAIR generation (MinHash/SimHash/cosine LSH):
  * pairs only say "a ~ b"; deduplication needs "keep one per transitive
  * cluster", i.e. components.
  *
  * Algorithm: iterative min-label propagation. Each vertex starts labeled
  * with itself; every round it takes the min of its own label and its
  * neighbors' labels, until a fixpoint. Rounds needed = graph diameter.
  * That is the RIGHT trade for near-dup graphs specifically: components are
  * small, dense clusterettes (docs that all match each other), so diameter
  * is 2–4 and the whole thing is a handful of self-equi-joins on vertex id
  * — each one shuffle, AQE-coalesced. For adversarial high-diameter graphs
  * (long chains) the alternating large-star/small-star scheme converges in
  * O(log n) rounds instead; near-dup workloads don't produce those shapes,
  * and the iteration cap surfaces it loudly if one ever does.
  *
  * 100 TB notes:
  *  - State per round is (id, comp) — 16 bytes a vertex, partitioned by id;
  *    the edge table is re-used each round (persist it, not the labels'
  *    whole lineage); each round's labels persist until the next round's
  *    are materialized, then release — storage stays one round deep.
  *  - Convergence detection costs NO extra action: the changed-row count
  *    is a LongAccumulator folded into the pass that materializes each
  *    round's labels (the old shape paid a second count-then-isEmpty scan
  *    per round). Task retries can only inflate the count, never fake a
  *    zero, so the zero/nonzero convergence test is retry-safe.
  */
object Components {

  /** Label every vertex of the undirected pair graph with the minimum
    * vertex id reachable from it.
    *
    * OWNERSHIP: the returned frame is PERSISTED (it is the fixpoint of an
    * iterative computation — returning it lazy would replay every round on
    * each downstream action). Call `.unpersist()` on it when done, the
    * same contract as GraphX/GraphFrames component results.
    *
    * @param edges two LongType columns (`srcCol`, `dstCol`), one row per
    *              undirected edge; self-loops and duplicates are fine.
    * @return (id, comp) — one row per distinct vertex, persisted.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst", maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"), col(srcCol).cast("long").as("v")))
      .distinct()
      .persist()
    // Each round's new labels are REBASED onto a leaf plan
    // (createDataFrame over the round's RDD) before becoming the next
    // round's input. Both halves matter:
    //  - plan truncation is ESSENTIAL, not cosmetic: `updated` references
    //    `labels` twice (via nbrMin and the join), so without a leaf
    //    rebase the logical plan DOUBLES per round — ~10 rounds in,
    //    analysis alone dwarfs execution (observed as an apparent hang);
    //  - persist new / materialize / unpersist previous keeps cached
    //    blocks one round deep (localCheckpoint-per-round would pin every
    //    round's blocks for the app lifetime). The underlying RDD lineage
    //    grows linearly and recompute-after-eviction is deterministic.
    val spark = edges.sparkSession
    val labelSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, comp BIGINT")
    def rebased(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, labelSchema)
    var labels = rebased(
      sym.select(col("u").as("id")).distinct().withColumn("comp", col("id")))
      .persist()
    labels.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels, sym("v") === labels("id"))
        .groupBy(col("u").as("nid")).agg(min("comp").as("nbr_comp"))
      // The rebase map doubles as the convergence probe: it drops the prev
      // label while counting rows where it differs from the new one into an
      // accumulator, so materializing the round (count) IS the convergence
      // check — one job per round, not a count + isEmpty pair.
      val changed = spark.sparkContext.longAccumulator(s"graft.cc.changed.$iter")
      val roundRdd = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .rdd.map { r =>
          if (r.getLong(1) != r.getLong(2)) changed.add(1L)
          org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))
        }
      val updated = spark.createDataFrame(roundRdd, labelSchema).persist()
      updated.count()
      converged = changed.value == 0L
      labels.unpersist()
      labels = updated
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      labels.unpersist()  // don't orphan the cache on the failure path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds the near-dup shape this is tuned for; " +
          "raise maxIter or use an alternating-star formulation")
    }
    labels
  }

  /** Keep one canonical document per near-dup cluster. By default the
    * member with the smallest id survives; with `preferBy` set to a numeric
    * column of `docs` (e.g. a quality score), the HIGHEST-scoring member
    * survives, id as the deterministic tiebreak — "when dropping
    * duplicates, keep the best copy", the curation default. Documents in no
    * pair are their own cluster and always survive.
    *
    * Cache ownership: the internal components frame is released BEFORE
    * returning — the loser-id set (one long per dropped doc, strictly
    * smaller than the pair graph) is eagerly materialized via
    * localCheckpoint, which truncates the lineage back to the components
    * frame so its cache can be unpersisted here. The checkpoint blocks
    * belong to the returned plan and are reclaimed by Spark's
    * ContextCleaner once the result is unreachable — nothing is pinned in
    * the cache manager for the app lifetime. (localCheckpoint trades
    * executor-loss fault tolerance for speed; acceptable for an
    * intermediate that a failed job would simply recompute by rerunning
    * the dedup.)
    *
    * @param docs     table with `idCol` (and `preferBy` if given)
    * @param pairs    near-dup pairs (`aCol`, `bCol`) from any pair generator
    * @param preferBy optional docs column whose max picks the survivor
    * @return docs rows minus non-canonical cluster members
    */
  def dedupByComponents(docs: DataFrame, pairs: DataFrame,
                        idCol: String = "doc_id",
                        aCol: String = "id_a", bCol: String = "id_b",
                        preferBy: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val losers = preferBy match {
      case None =>
        comps
          .groupBy("comp").agg(min("id").as("keep"))
          .join(comps, "comp")
          .filter(col("id") =!= col("keep"))
          .select(col("id"))
      case Some(scoreCol) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("comp").orderBy(desc("pref"), col("id"))
        comps
          .join(docs.select(col(idCol).as("id"), col(scoreCol).as("pref")), "id")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") > 1)
          .select(col("id"))
    }
    val losersM = losers.localCheckpoint() // eager: materializes + cuts lineage
    comps.unpersist()
    docs.join(losersM, docs(idCol) === losersM("id"), "left_anti")
  }
}
