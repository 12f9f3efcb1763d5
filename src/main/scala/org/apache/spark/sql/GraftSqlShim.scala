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

  /** `SparkSession.sessionUUID` is `private[sql]` — unique and stable
    * per session, unlike an identity hash code (which a new session
    * can collide with after the old one is GC'd). Used as the memo
    * cache key in [[graft.Materialized]].
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
