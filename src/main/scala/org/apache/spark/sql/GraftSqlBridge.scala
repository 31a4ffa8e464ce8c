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
}
