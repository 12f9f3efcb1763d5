package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textStats counts chars/words/tokens/markers") {
    val d = Seq((1L, "the cat9 sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(d).collect().head
    assert(r.getInt(1) == 23)          // n_chars
    assert(r.getInt(2) == 6)           // words
    assert(r.getInt(3) == 7)           // [a-z]+|[0-9]+ → the,cat,9,sat,on,the,mat
    assert(r.getInt(4) == 2)           // "the" occurrences
  }

  test("trigrams of short strings") {
    val d = Seq((1L, "abcd"), (2L, "ab")).toDF("id", "t")
    val out = d.select(col("id"), TextAnalysis.trigrams(col("t")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("abc", "bcd"))
    assert(out(2L) == Seq())
  }

  test("fingerprints: case/punct-insensitive canonical hash") {
    val d = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("languageId is deterministic and labels every doc") {
    val docs = Tables.documents(spark, sf0001)
    val out = TextAnalysis.languageId(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("pred_lang").isNull).count() == 0)
    // deterministic across partitionings
    val a = out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val b = TextAnalysis.languageId(docs.repartition(9)).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(a == b)
    out.unpersist()
  }
}
