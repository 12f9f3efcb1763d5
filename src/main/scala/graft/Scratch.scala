package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler — NOT part of the library (never committed). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val spark = GraftSession.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def time(label: String)(f: => Long): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label rep=$r rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    val documents = Tables.documents(spark, sfDir)
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+", -1)).as("term"))
      .filter(length(col("term")) > 0)
    time("explode-only")(toks.count())
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    time("tf-groupBy")(tf.count())
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val idf = df.crossJoin(broadcast(nDocs))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
    val scored = tf.join(idf, "term")
      .withColumn("score", round(col("tf") * col("idf"), 6))
    time("scored-join")(scored.count())
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    val ranked = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
    time("ranked-window")(ranked.count())
    time("full-with-sort")(ranked.orderBy("doc_id", "rnk").count())
    time("registry-key")(SparkEntry.queries("text_tfidf")(spark, sfDir).count())
    spark.stop()
  }
}
