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
  *  - Convergence check is an any-row-changed probe (`isEmpty` on the
  *    changed set) — no global count.
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
      val updated = rebased(
        labels
          .join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp")))
        .persist()
      updated.count()
      converged = updated
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
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
    * NOTE: the internal components frame stays cached until the returned
    * frame's action completes (same ownership story as
    * [[connectedComponents]]); for bulk pipelines issuing many dedup
    * calls in one session, `spark.catalog.clearCache()` between stages
    * releases them.
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
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
