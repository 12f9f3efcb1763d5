package graft.operators

import graft.{SparkSpec, Tables}

/** Pins the fixed-size audit-panel contract added after the 10× scale
  * curve (round 9): percentage sampling alone leaves quadratic audits
  * growing (pct·n)² — measured 55× on sim_knn_graph and 14× on
  * sim_pair_hist for 10× data — so both cap their samples with an
  * md5-ordered limit. The cap must plan as `TakeOrderedAndProject`
  * (per-partition bounded heaps): a `Sort + GlobalLimit` pair instead
  * would mean a full global sort of the corpus just to pick the
  * panel, re-introducing the scale problem the cap exists to fix.
  */
class PanelCapSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("knnGraph's panel selection is a bounded heap, and the panel bounds the output") {
    val e = Tables.embeddings(spark, sf0001)
    val df = Similarity.knnGraph(e, k = 3, samplePct = 100, maxPanel = 7)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"panel cap must plan as a bounded heap, not a global sort; plan:\n$plan")
    val rows = df.collect()
    // ≤ panel × k edges, and only panel members appear as queries
    assert(rows.map(_.getLong(0)).distinct.length <= 7)
    assert(rows.length <= 7 * 3 && rows.nonEmpty)
  }

  test("pairCosineHistogram's side panels bound the census pair count") {
    val e = Tables.embeddings(spark, sf0001)
    val full = Similarity.pairCosineHistogram(e, modA = 1, modB = 1, maxSide = 6)
    assert(planOf(full).contains("TakeOrderedAndProject"))
    // ≤ 6×6 scored pairs regardless of corpus size
    val nPairs = full.collect().map(_.getLong(3)).sum
    assert(nPairs <= 36 && nPairs > 0)
  }
}
