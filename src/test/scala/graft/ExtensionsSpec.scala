package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{GraftExtensions, VectorFunctions}
import graft.functions.VectorFunctions.{FloatVectorDot, FloatVectorNormSq}

/** SparkSessionExtensions wiring: injected functions resolve in SQL, and
  * the custom optimizer rule rewrites vec_dot(x, x) → vec_norm_sq(x).
  */
class ExtensionsSpec extends SparkSpecBase {

  // Don't leak the extensions-bearing session into later suites: stop it so
  // the next suite's getOrCreate builds a standard session again
  // (SparkSpecBase contract).
  override def afterAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    super.afterAll()
  }

  private def freshSessionWithExtensions(): SparkSession = {
    // getOrCreate returns an existing session WITHOUT applying extensions,
    // so stop the active one first; later suites getOrCreate a fresh
    // session themselves (SparkSpecBase contract)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("optimizer rule rewrites self-dot to norm-sq on semantically equal children") {
    VectorFunctions.register(spark)
    val df = spark.sql(
      "SELECT vec_dot(a, a) AS d FROM VALUES (array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) t(a)")
    val rewritten = graft.functions.RewriteSelfDotToNormSq(
      df.queryExecution.analyzed)
    val exprs = rewritten.expressions.flatMap(_.collect {
      case e: FloatVectorNormSq => e
    })
    assert(exprs.nonEmpty, "vec_dot(a,a) not rewritten:\n" + rewritten)
    assert(!rewritten.expressions.exists(_.collectFirst {
      case e: FloatVectorDot => e }.isDefined))
    // semantics preserved
    assert(df.head().getDouble(0) == 25.0)
  }

  test("rule leaves distinct-operand dots untouched") {
    VectorFunctions.register(spark)
    val df = spark.sql(
      """SELECT vec_dot(a, b) AS d FROM VALUES
        |  (array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) t(a, b)""".stripMargin)
    val rewritten = graft.functions.RewriteSelfDotToNormSq(df.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.collectFirst {
      case e: FloatVectorDot => e }.isDefined))
    assert(df.head().getDouble(0) == 2.0)
  }

  test("extensions install functions into a session built with withExtensions") {
    val s = freshSessionWithExtensions()
    // functions usable straight from SQL with no manual registration call
    val v = s.sql(
      "SELECT vec_norm_sq(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
      .head().getDouble(0)
    assert(v == 25.0)
  }
}
