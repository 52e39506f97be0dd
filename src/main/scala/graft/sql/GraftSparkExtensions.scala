package graft.sql

import org.apache.spark.sql.SparkSessionExtensions

/** Wire the graft SQL surface into a session:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
  *     .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
  *     .config("spark.sql.catalog.graft.warehouse", "/path/to/warehouse")
  * }}}
  * after which `spark.sql("MERGE INTO graft.ns.t …")`, time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF`) and `CALL graft.system.…`
  * maintenance procedures all operate on snapshot-log tables. The
  * extension is inert for sessions that never touch a graft relation.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => GraftSqlRule(session))
    // batch CDC as a TABLE FUNCTION: `SELECT * FROM
    // table_changes('ns.t', fromV, toV, 'k1,k2')` — registered through
    // the native TableFunctionRegistry hook so Spark's own TVF
    // resolution finds it (Delta's table_changes shape, lowered onto
    // SnapshotLog.changesBetween — distributed, nothing driver-side)
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.GraftSqlRule", "table_changes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSqlRule.lowerTableChanges(
          org.apache.spark.sql.SparkSession.active, args)))
    // keyless CDC twin over row identities (round 13):
    // `table_changes_by_rowid('ns.t', fromV, toV)` — file-granular diff
    // on flat lineages, shadow-resolving on merge-on-read ones
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("table_changes_by_rowid"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.GraftSqlRule", "table_changes_by_rowid"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSqlRule.lowerTableChangesByRowId(
          org.apache.spark.sql.SparkSession.active, args)))
    // ANN search over the persisted index sidecar (round 13):
    // `SELECT * FROM ann_knn('ns.t', array(0.1, …), 5)` — probes the
    // nprobe nearest IVF cells with partition-pruned slice reads,
    // tombstone-filtered; 5-arg form picks the index name and nprobe
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ann_knn"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.GraftSqlRule", "ann_knn"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSqlRule.lowerAnnKnn(
          org.apache.spark.sql.SparkSession.active, args)))
    // batch ANN search (round 15): `SELECT * FROM ann_knn_batch(
    // 'ns.t', 'query_view', 5)` — one pass over the union of every
    // query's probed cells, per-row identical to per-query ann_knn
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ann_knn_batch"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.GraftSqlRule", "ann_knn_batch"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSqlRule.lowerAnnKnnBatch(
          org.apache.spark.sql.SparkSession.active, args)))
    // index-amortized near-duplicate candidates (round 14; ivfpq SDC
    // dispatch round 16; AUTO margin + multi-probe round 17):
    // `SELECT * FROM ann_near_dup('ns.t', 0.9
    // [, index_name[, margin[, probes]]])` — same-cell (probes = 1) or
    // stored-top-2-cell (probes = 2) pairs of the persisted index;
    // float indexes score exactly, code-only (ivfpq) indexes score by
    // reconstructed SDC within `margin` (< 0 = AUTO, the model's
    // measured quantization error) then verify exactly
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ann_near_dup"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sql.GraftSqlRule", "ann_near_dup"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftSqlRule.lowerAnnNearDup(
          org.apache.spark.sql.SparkSession.active, args)))
    // the codegen'd vector kernels (vec_dot, vec_norm_sq, vec_lsh,
    // vec_lsh_probe, vec_pq_encode, vec_pq_adc) become ordinary SQL
    // functions in extension-configured sessions — the same registry
    // entries VectorFunctions.register installs per-session for the
    // harness, injected once here
    graft.functions.VectorFunctions.builtins.foreach(ext.injectFunction)
  }
}
