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

  /** Storage footprint (memory + disk blocks) of an eagerly
    * localCheckpointed frame — the measured size the
    * [[graft.Materialized]] hybrid face routes on. None when the
    * plan is not a checkpoint-backed LogicalRDD or the blocks are not
    * (yet) registered.
    */
  def checkpointBytes(df: Dataset[_]): Option[Long] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id).map(i => i.memSize + i.diskSize)
      case _ => None
    }

  /** Release a localCheckpointed frame's blocks. Only safe when the
    * frame will never be read again (the checkpoint truncated its
    * lineage, so the data is unrecoverable afterwards) — the hybrid
    * memo face calls this after promoting a too-big memo to its
    * parquet sink table, which is what every later read serves.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(false); ()
      case _ => ()
    }
}
