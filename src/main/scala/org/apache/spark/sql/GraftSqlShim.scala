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
    * [[graft.Materialized]] hybrid face routes on. Queries the block
    * manager MASTER synchronously per block rather than
    * `getRDDStorageInfo` (which is populated asynchronously via the
    * listener bus, so right after an eager checkpoint the RDD could be
    * absent or under-reported and an above-threshold memo would
    * nondeterministically skip promotion — the exact heap floor the
    * hybrid face exists to bound). Block puts report to the master
    * inline (`tellMaster`), so by the time the eager checkpoint action
    * returns every block is registered. Replicated copies are
    * deduplicated (max per block, then summed). None when the plan is
    * not a checkpoint-backed LogicalRDD or no block is registered.
    */
  def checkpointBytes(df: Dataset[_]): Option[Long] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        val master = org.apache.spark.SparkEnv.get.blockManager.master
        val sizes = l.rdd.partitions.indices.flatMap { i =>
          val statuses = master.getBlockStatus(
            org.apache.spark.storage.RDDBlockId(l.rdd.id, i),
            askStorageEndpoints = true)
          statuses.values.map(s => s.memSize + s.diskSize).maxOption
        }
        if (sizes.isEmpty) None else Some(sizes.sum)
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
