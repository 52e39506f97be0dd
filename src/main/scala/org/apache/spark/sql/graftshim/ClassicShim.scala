package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` classic internals, the
  * standard extension-library technique (a lakehouse format or query
  * extension needs exactly these two hooks): materialize a Dataset from
  * a composed logical plan, and wrap a Catalyst expression as a public
  * Column. Kept to one tiny object so the internal surface we touch is
  * auditable at a glance.
  */
object ClassicShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
