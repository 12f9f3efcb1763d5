package graft

import org.apache.spark.sql.DataFrame

/** Differential guard for the materialize-once wiring: every registry
  * key served from a [[Materialized]] pair memo must return exactly
  * the rows of the direct (un-memoized) operator call. The memo is a
  * pure caching layer — if a future rewiring feeds a consumer a pair
  * table built with different parameters (threshold, hashes, bands),
  * this is the spec that catches it, per key, with row-level diffs.
  */
class MemoEquivalenceSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def check(key: String, direct: DataFrame): Unit = {
    val served = SparkEntry.queries(key)(spark, sf0001)
    assert(rowsOf(served) === rowsOf(direct), s"memo-served $key diverges from direct")
  }

  test("dedup family memo paths equal their direct computations") {
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    check("dedup_minhash_md5", operators.Dedup.minhashNearDupsMd5(docs))
    check("dedup_ngram_jaccard", operators.Dedup.ngramJaccardPairs(docs))
    check("dedup_simhash_md5_neardups", operators.Dedup.simhashMd5NearDups(docs))
    check("dedup_source_matrix", operators.Dedup.crossSourceNearDups(docs))
    check("dedup_split_leakage", operators.Dedup.splitLeakage(docs))
    check("dedup_lex_vs_sem", operators.Dedup.lexicalVsSemantic(docs, emb))
    check("dedup_minhash_est_error", operators.Dedup.minhashEstErrorMd5(docs))
    check("dedup_lsh_recall", operators.Dedup.lshRecallAudit(docs))
    check("dedup_groups_md5",
      operators.Dedup.connectedGroups(operators.Dedup.simhashMd5NearDups(docs))
        .orderBy("doc_id"))
    check("dedup_prefix_pairs", operators.Dedup.prefixFilterPairs(docs))
    check("dedup_prefix_pair_bands", operators.Dedup.prefixFilterPairBands(docs))
  }

  test("text family memo paths equal their direct computations") {
    val docs = Tables.documents(spark, sf0001)
    check("text_bigram_logprob", operators.TextAnalysis.bigramLogProb(docs))
    check("text_ppl_by_source", operators.TextAnalysis.pplBySource(docs))
    check("text_unigram_logprob", operators.TextAnalysis.unigramLogProb(docs))
  }

  test("relational family memo paths equal their direct computations") {
    check("q_copurchase_lift_capped",
      queries.Relational.copurchaseLiftCapped(Tables.lineitem(spark, sf0001)))
  }

  test("similarity family memo paths equal their direct computations") {
    val emb = Tables.embeddings(spark, sf0001)
    check("sim_cosine_neardup",
      operators.Similarity.cosineNearDupPairs(emb, threshold = 0.2,
        nTables = 4, bitsPerTable = 8))
    check("sim_semantic_groups", operators.Similarity.semanticGroups(emb))
    check("sim_threshold_sweep", operators.Similarity.thresholdSweep(emb))
  }
}
