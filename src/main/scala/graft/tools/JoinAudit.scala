package graft.tools
import org.apache.spark.sql.SparkSession
/** One-off scale-smell sweep: flags any declared query whose sf0.1 plan
  * contains a nested-loop join outside the documented allowlist. Run:
  * `sbt "runMain graft.tools.JoinAudit [dataDir]"` — expect "smells=0".
  */
object JoinAudit {
  // Queries where a nested-loop join is the DOCUMENTED intent:
  //  - q09 cross of tiny inputs; q32/q41 all-pairs exact-oracle baselines
  //    (LSH/IVF/PQ are the scale paths); q10 band self-join baseline
  //    (x10 is the banded equi twin); q50 scalar-subquery side results;
  //  - q35/q59/q88: a 1-row count/cutoff/boilerplate-set broadcast
  //    attached via BNLJ — a scalar attach, constant work at any corpus
  //    size (q88's array is Zipf-bounded by L/θ, see Training.q88).
  private val allowed = Set("q09_cross", "q32_knn_cosine", "q41_cosine_near_dup",
    "q10_range_join", "q50_scalar_subquery", "q35_tfidf", "q59_contamination",
    "q88_df_prune")
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // a renamed query must fail the sweep loudly, not silently drop its
    // nested-loop exemption (an allowlist of stale names audits nothing)
    val stale = allowed -- graft.SparkEntry.queries.keySet
    require(stale.isEmpty, s"allowlist names unknown queries: $stale")
    var bad = 0
    var errs = 0
    var audited = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        audited += 1
        val nl = "BroadcastNestedLoopJoin".r.findAllIn(p).size +
                 "CartesianProduct".r.findAllIn(p).size
        if (nl > 0 && !allowed(name)) { bad += 1; println(s"SMELL $name: $nl nested-loop joins") }
      } catch {
        // NonFatal only: an OOM/LinkageError means the JVM itself is
        // broken — counting it as a per-query error and sweeping on
        // would report a meaningless smells=0
        case scala.util.control.NonFatal(e) =>
          errs += 1; println(s"$name ERROR ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    println(s"join audit done, audited=$audited smells=$bad errors=$errs")
    spark.stop()
    // a sweep that planned nothing, failed queries, or found smells must
    // NOT exit 0 — "smells=0" is only meaningful when every plan was seen
    if (bad > 0 || errs > 0 || audited == 0) sys.exit(1)
  }
}
