package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.{SparkSpec, Tables}

/** Contract of the end-to-end curation funnel
  * ([[Curation.curatePipeline]]): stage ordering, monotone shrink
  * through the filter stages, layout-stage invariants, and the
  * `observe` counters a driver reads instead of re-running stages.
  */
class CurationSpec extends SparkSpec {

  test("curate pipeline: funnel shape and stage invariants") {
    val out = Curation.curatePipeline(Tables.documents(spark, sf0001))
      .collect().sortBy(_.getInt(0))
    assert(out.map(_.getString(1)).toSeq ===
      Seq("raw", "quality", "exact", "neardup", "decontam", "resample", "pack", "shard"))
    val docCounts = out.map(_.getLong(3))
    // doc survivors never grow through the filter stages (0..5), and
    // the layout stages (6, 7) report the final corpus unchanged
    for (i <- 1 to 5)
      assert(docCounts(i) <= docCounts(i - 1), s"stage $i grew the corpus")
    assert(docCounts(6) == docCounts(5) && docCounts(7) == docCounts(5))
    assert(out(6).getLong(4) == out(5).getLong(4), "pack stage changed token total")
    // packs cover the surviving tokens: n_packs >= ceil(tokens/budget)
    // can under-shoot only via per-source remainders, never exceed docs
    assert(out(6).getLong(2) <= docCounts(5))
    assert(out(7).getLong(2) <= 16, "more shards than nShards")
    assert(docCounts(0) > 0 && docCounts(5) > 0)
  }

  test("curate pipeline: observe counters match the emitted funnel rows") {
    val metrics = mutable.Map[String, Long]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("curate_")) metrics.synchronized {
            metrics(name) = row.getLong(0)
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Curation.curatePipeline(Tables.documents(spark, sf0001))
        .collect().sortBy(_.getInt(0))
      // listener delivery is async; poll briefly until all 8 land
      val deadline = System.nanoTime() + 30e9.toLong
      while (metrics.synchronized(metrics.size) < 8 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val expected = Map(
        "curate_s0_raw" -> out(0).getLong(3), "curate_s1_quality" -> out(1).getLong(3),
        "curate_s2_exact" -> out(2).getLong(3), "curate_s3_neardup" -> out(3).getLong(3),
        "curate_s4_decontam" -> out(4).getLong(3), "curate_s5_resample" -> out(5).getLong(3),
        "curate_s6_pack" -> out(6).getLong(2), "curate_s7_shard" -> out(7).getLong(2))
      metrics.synchronized {
        expected.foreach { case (name, want) =>
          assert(metrics.get(name).contains(want),
            s"observe metric $name = ${metrics.get(name)}, funnel row says $want")
        }
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
