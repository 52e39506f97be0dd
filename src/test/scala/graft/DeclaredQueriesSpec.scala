package graft

/** Safety net for the driver's t2 gate (Verify.scala swallows per-query
  * exceptions): every declared query must RUN, return rows, and be
  * deterministic across two executions (SURVEY §5.2.6 — catches any
  * §2.0.9 nondeterminism violation before the hash gate does).
  */
class DeclaredQueriesSpec extends SparkSpecBase {

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, is non-empty and deterministic at sf0.001") {
      val r1 = fn(spark, sf0001).collect().toSeq
      val r2 = fn(spark, sf0001).collect().toSeq
      assert(r1 == r2, s"$name not deterministic across runs")
      assert(r1.nonEmpty, s"$name returned 0 rows at sf0.001")
    }
  }
}
