package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: per-doc stats,
  * token counting, quality scoring, fingerprinting, language ID.
  *
  * Everything except language ID is pure codegen'd column expressions
  * (no UDFs) — one narrow map stage, no shuffle, trivially scales to
  * 100 TB of documents. Language ID trains per-language n-gram
  * profiles with one aggregation and classifies via a broadcast of
  * the (tiny) profile table.
  */
object TextAnalysis {

  /** Per-document surface statistics: chars, whitespace words, regex
    * tokens (BPE-ish word/number/punct split), marker-word count, and
    * a simple quality score. All built-ins → single WholeStageCodegen
    * stage over the scan.
    */
  def textStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      size(split(col("text"), " ", -1)).as("n_words"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("n_tokens"),
      ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3)
        .cast("int").as("n_the"),
      round(
        (length(col("text")) - length(regexp_replace(col("text"), "the", ""))).cast("double")
          / (lit(3.0) * greatest(length(col("text")), lit(1))), 6).as("the_density"))
      .orderBy("doc_id")

  /** Canonical-form fingerprint: md5 of the lowercased text with
    * everything but [a-z ] stripped. Robust to punctuation/case edits;
    * groupable for near-exact dedup.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "[^a-z ]", "")).as("fp"))
      .orderBy("doc_id")

  /** Per-source quality report: doc counts, length stats, mean token
    * count — the "filter your crawl" aggregation.
    */
  def qualityBySource(documents: DataFrame): DataFrame =
    documents
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum("n_chars"), lit(0L)).as("total_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        round(avg(size(split(col("text"), " ", -1))), 4).as("avg_words"))
      .orderBy("source")

  /** Language ID via corpus-trained character-trigram profiles.
    *
    * Train: explode docs to trigrams, count per (lang, gram), keep the
    * top-`profileSize` per language (window), collect to a broadcast
    * map. Classify: score each doc by summing log-ish weights of its
    * trigrams against each profile; argmax lang.
    *
    * Scale: the profile is O(langs × profileSize) — KBs — broadcast;
    * classification is a map-only stage. Training is one shuffle on
    * (lang, gram) with map-side combine.
    */
  def languageId(documents: DataFrame, profileSize: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = documents
      .select(col("lang"), lower(col("text")).as("t"))
      .select(col("lang"), explode(trigrams(col("t"))).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))
    val profile = grams
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= profileSize)
      .select("lang", "gram", "rank")
    val docGrams = documents
      .select(col("doc_id"), col("lang").as("true_lang"), lower(col("text")).as("t"))
      .select(col("doc_id"), col("true_lang"), explode_outer(trigrams(col("t"))).as("gram"))
    // score = Σ (profileSize - rank + 1) over matching grams
    val scored = docGrams
      .join(broadcast(profile), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("true_lang"), col("lang"))
      .agg(coalesce(sum(lit(profileSize + 1) - col("rank")), lit(0L)).as("score"))
    val best = Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang").asc_nulls_last)
    scored
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("true_lang"), coalesce(col("lang"), lit("und")).as("pred_lang"), col("score"))
      .orderBy("doc_id")
  }

  /** Character trigrams of an already-materialized (and lowercased)
    * text column. The lambda must only reference a bound column —
    * embedding e.g. `lower(text)` here would re-evaluate it per
    * element under interpreted higher-order-function eval (O(len²)
    * per doc). Callers materialize `lower(text)` in a prior select.
    */
  private[graft] def trigrams(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
}
