package graft

import graft.engine.Catalog

class CatalogSpec extends SparkSpecBase {

  test("registerAll exposes every table to spark.sql, with functions installed") {
    Catalog.registerAll(spark, sf0001)
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"$t empty")
    }
    // events view carries the normalized timestamp (NTZ to match the other
    // fixture timestamp columns and DuckDB's naive read)
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType.typeName
      == "timestamp_ntz")
    // ad-hoc SQL joining views + native function in one statement
    val r = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin)
    assert(r.count() == 3)
    val sim = spark.sql(
      """SELECT vec_dot(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .head().getDouble(0)
    assert(sim >= -1.0001 && sim <= 1.0001)
  }

  test("analyze writes catalog stats and an unhinted dim join broadcasts on them") {
    try {
      val (nationRows, nationBytes) = Catalog.analyze(spark, sf0001, "nation")
      assert(nationRows == BigInt(25) && nationBytes > 0, s"($nationRows, $nationBytes)")
      Catalog.analyze(spark, sf0001, "customer")
      // column stats landed too (distinct-count for the join key)
      val keyStats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("nation_t"))
        .stats.get.colStats.get("n_nationkey")
      assert(keyStats.exists(_.distinctCount.isDefined), keyStats.toString)
      // the broadcast decision comes from the catalog size stat — the plan
      // must broadcast the analyzed 25-row dim with NO hint anywhere
      val joined = spark.table("customer_t")
        .join(spark.table("nation_t"),
          org.apache.spark.sql.functions.col("c_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      // and the optimizer's sizeInBytes for the dim is the analyzed figure,
      // not a fallback estimate
      val planStats = spark.table("nation_t").queryExecution.optimizedPlan.stats
      assert(planStats.sizeInBytes == nationBytes,
        s"plan sees ${planStats.sizeInBytes}, catalog has $nationBytes")
    } finally {
      spark.sql("DROP TABLE IF EXISTS nation_t")
      spark.sql("DROP TABLE IF EXISTS customer_t")
    }
  }
}
