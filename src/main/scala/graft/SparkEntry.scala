package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Bearly
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Relational, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a deterministic DataFrame (total ORDER BY,
  * rounded derived doubles) so it hash-matches its `oracleSql` twin
  * run by DuckDB over the same parquet tables. Entries without an
  * oracle (approx / not SQL-expressible) get the driver's rows-only
  * check and are pinned by ScalaTest golden/property specs instead.
  */
object SparkEntry
  extends RelationalRegistry with DedupRegistry with SimilarityRegistry
  with TextRegistry with EventRegistry with MultimodalRegistry
  with BearlyRegistry with RegistryShared {

  private def t(name: String)(implicit spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    implicit val dir: String = "/root/testdata/sf0.001"
    Relational.revenueByRegionYear(t("region"), t("nation"), t("customer"), t("orders"), t("lineitem"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bearlyQueries ++ relationalQueries ++ dedupQueries ++ simQueries ++
      textQueries ++ eventQueries ++ mmQueries


  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx / non-relational
    * ops) fall back to the driver's rows-only check.
    */
  def oracleSql: Map[String, String] =
    bearlyOracles ++ relationalOracles ++ dedupOracles ++ simOracles ++
      textOracles ++ eventOracles ++ mmOracles

  def noOracleEvidence: Map[String, (Option[String], String)] = Map(
    // xxhash64 fast paths ↔ md5 twins computing the same pipeline on
    // SQL-expressible hashes
    "dedup_minhash_pairs"    -> (Some("dedup_minhash_md5"), "DedupSpec"),
    "dedup_simhash"          -> (Some("dedup_simhash_md5"), "DedupSpec"),
    "dedup_simhash_neardups" -> (Some("dedup_simhash_md5_neardups"), "DedupSpec"),
    // sketches ↔ exact twins (tolerance specs bound the estimate)
    "q_approx_distinct"        -> (Some("q_distinct"), "RelationalSpec"),
    "q_percentiles_approx"     -> (Some("q_percentiles"), "RelationalSpec"),
    "q_column_profile_approx"  -> (Some("q_column_profile"), "RelationalSpec"),
    "dedup_exact_stats_approx" -> (Some("dedup_exact_stats"), "DedupSpec"),
    "ev_hll_rollup"            -> (Some("ev_distinct_rollup"), "EventOpsSpec"),
    // IVF ANN: deterministic-seed twin + recall report are both green
    "sim_ivf_topk" -> (Some("sim_ivf_topk_seed"), "SimilaritySpec"),
    // language ID: relational modulo-sampled twin + differential spec
    "text_lang_id" -> (Some("text_lang_id_rel"), "TextAnalysisSpec"),
  )
}
