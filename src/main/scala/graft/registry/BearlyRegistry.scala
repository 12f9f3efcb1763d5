package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Bearly
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Relational, TpchShapes}

/** reference parity (bearly) — the `bearlyQueries`/`bearlyOracles` slice of the driver contract
  * (split from the single SparkEntry registry in round 9; SparkEntry
  * merges every domain trait back into the 313-key map the driver
  * reads — see [[graft.SparkEntry]]).
  */
private[graft] trait BearlyRegistry {
  protected def bearlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity (SURVEY §2.1) ---
    "bearly_sum_lineitem" -> ((s, d) => Bearly.sum(Tables.lineitem(s, d))),
    "bearly_produce_array" -> ((s, _) =>
      Bearly.produceArray(s).orderBy(org.apache.spark.sql.functions.col("awesome_numbers").asc_nulls_first)),
    "bearly_produce_stream" -> ((s, _) =>
      Bearly.produceStream(s).orderBy(org.apache.spark.sql.functions.col("column0").asc_nulls_first)),
  )

  protected def bearlyOracles: Map[String, String] = Map(
    "bearly_sum_lineitem" ->
      """SELECT CAST(coalesce(sum(l_orderkey),0) AS BIGINT) AS l_orderkey,
        |       CAST(coalesce(sum(l_partkey),0) AS BIGINT) AS l_partkey,
        |       CAST(coalesce(sum(l_suppkey),0) AS BIGINT) AS l_suppkey
        |FROM lineitem""".stripMargin,
    "bearly_produce_array" ->
      """SELECT CAST(c0 AS BIGINT) AS awesome_numbers
        |FROM (VALUES (42),(555),(NULL)) AS t(c0)
        |ORDER BY awesome_numbers NULLS FIRST""".stripMargin,
    "bearly_produce_stream" ->
      """SELECT CAST(c0 AS INTEGER) AS column0, CAST(c1 AS BIGINT) AS column1
        |FROM (VALUES (42,555),(84,1110),(NULL,NULL)) AS t(c0,c1)
        |ORDER BY column0 NULLS FIRST""".stripMargin,
  )
}
