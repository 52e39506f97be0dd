package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reshaping operators (SURVEY.md §2, round-2 additions): pivot (long→wide)
  * and unpivot (wide→long). Both are single-shuffle plans: pivot is a
  * two-phase hash aggregation over the groupBy key with `pivot_first`
  * partial states (explicit value list — no extra distinct-scan job, stable
  * column order); unpivot is a generate-style Expand that multiplies rows
  * map-side with NO shuffle at all until the final presentation sort.
  */
object Reshape {
  private val D182 = DecimalType(18, 2)

  // q45 — priority × status matrix of exact sums. Declared outputs follow
  // the driver-hash rule: DECIMAL math internal, DOUBLE out.
  def q45(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast(D182)).cast("double"))
      .orderBy("o_orderpriority")

  val q45Sql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F",
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O",
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q46 — unpivot two measure columns into (metric, value) rows. Spark's
  // Unpivot logical plan expands each row map-side (like explode, no
  // shuffle); the oracle spells the same thing as UNION ALL.
  def q46(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val q46Sql: String =
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_pivot"   -> (q45 _),
    "q46_unpivot" -> (q46 _))

  val oracle: Map[String, String] = Map(
    "q45_pivot"   -> q45Sql,
    "q46_unpivot" -> q46Sql)
}
