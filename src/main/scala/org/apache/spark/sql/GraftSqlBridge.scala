package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors: turning a hand-built
  * [[LogicalPlan]] into a DataFrame. This is the standard extension-library
  * pattern for custom operators (the public `SparkSessionExtensions` API
  * injects rules/strategies but offers no plan→DataFrame constructor).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expression -> Column, for native expressions that carry non-expression
    * constructor parameters (a codebook reference) and therefore cannot be
    * registered through the name-based FunctionRegistry builders.
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Column -> underlying Catalyst expression (inverse of [[column]]). */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
