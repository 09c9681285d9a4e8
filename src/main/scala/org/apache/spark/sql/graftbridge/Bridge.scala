package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the converters `private[sql]` (`classic.ExpressionUtils`),
  * so extension libraries place one small object inside the
  * `org.apache.spark.sql` namespace to reach them — the standard technique
  * used by Spark-ecosystem connector/extension projects. Everything else in
  * this library lives under `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (classic Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Type aliases for `private[sql]` analysis-time typing interfaces that
  * extension expressions need (Spark 4 narrowed their visibility). */
object TypeBridge {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
