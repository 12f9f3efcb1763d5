package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal shim into `private[sql]` plan construction, needed to wrap
  * graft's custom logical operators (e.g. AsOfJoinPlan) in a
  * DataFrame. This is the standard extension-library pattern: one
  * file in the org.apache.spark.sql package exposing exactly the two
  * internals the library needs, nothing else.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.queryExecution.analyzed
}
