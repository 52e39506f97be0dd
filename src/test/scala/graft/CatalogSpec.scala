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
}
