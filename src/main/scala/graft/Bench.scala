package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, materializing each result fully via the noop
  * sink (so projections/aggregations aren't pruned away the way a
  * bare count() would allow). Prints ONE JSON line.
  */
object Bench {
  /** Representative headline subset: one key per major operator family.
    * Used both for warmup (below) and for the compact final JSON line.
    */
  val headline: Seq[String] = Seq(
    "bearly_sum_lineitem", "q1_pricing_summary", "q3_top_revenue",
    "q5_local_supplier", "q_star_join_region_year", "q_window_topk",
    "q_percentiles_approx", "q_recursive_cte", "dedup_exact",
    "dedup_minhash_md5", "dedup_groups_md5", "dedup_ngram_jaccard",
    "dedup_pipeline", "dedup_passage_dedup", "sim_bruteforce_topk",
    "sim_ivf_topk", "sim_cosine_neardup", "sim_semantic_groups",
    "sim_knn_graph", "text_stats", "text_tfidf", "text_lang_id",
    "text_quality_filter", "ev_sessionize", "ev_asof_native",
    "ev_heavy_hitters", "mm_decode_features")

  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm only the headline subset on the smallest SF: warmup exists to
    // trigger codegen/JIT/classloading for the common operator shapes, and
    // the first timed round covers the rest. Warming all 150 queries twice
    // (r5) blew the driver's kill window (rc=124) — the full-fleet warmup
    // cost more than the information it bought.
    val warmDir = "/root/testdata/sf0.001"
    val qmap = SparkEntry.queries
    headline.foreach { name =>
      qmap.get(name).foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
    }
    // Interleaved rounds (run 1 = all queries, run 2 = all queries, …)
    // so a GC pause / janino-compile storm lands on one ROUND, not one
    // query's every sample. Reporting BOTH median and min keeps real
    // regressions separable from noise: min is the reproducible
    // steady-state cost, median shows the typical run.
    //
    // The whole loop is TIME-BOXED: the driver kills the bench process at a
    // fixed wall deadline, and a killed process prints no final JSON at all
    // (r5: rc=124, parsed null). A new round only STARTS if the previous
    // round's duration (plus 20% variance headroom — round-to-round swings
    // of ~1.5x are real under GC/codegen pressure) still fits inside 95%
    // of SPARK_GRAFT_BENCH_BUDGET_S — fewer iterations of a parseable
    // number beats five iterations of nothing.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "420").toDouble
    def elapsedS: Double = (System.nanoTime() - wallStart) / 1e9
    val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    var i = 0
    var lastRoundS = 0.0
    while (i < iters && (i == 0 || elapsedS + lastRoundS * 1.2 < budgetS * 0.95)) {
      val r0 = System.nanoTime()
      runs += qmap.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      lastRoundS = (System.nanoTime() - r0) / 1e9
      i += 1
      System.err.println(f"[bench] round $i/$iters done at $elapsedS%.1f s (round $lastRoundS%.1f s, budget $budgetS%.0f s)")
    }
    val itersCompleted = runs.length
    // True median: for an even sample count (reachable now that the
    // time-box can stop after 2 rounds) average the middle pair —
    // s(len/2) alone would report the MAX of 2 samples and bias the
    // headline high against odd-iteration baselines.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val names = runs.head.map(_._1)
    val byName = names.map(n => n -> runs.toSeq.map(_.toMap.apply(n)))
    val med = byName.map { case (n, xs) => n -> median(xs) }
    val mins = byName.map { case (n, xs) => n -> xs.min }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    val totalMin = mins.map(_._2).sum
    // The harness captures only the TAIL of the process output, so a
    // single JSON line carrying all 100+ per-query medians (~3 KB) gets
    // its head truncated and fails to parse (round-4 lesson:
    // BENCH_r04.json "parsed": null). Split the report: full per-query
    // detail goes to a file + early stderr; the FINAL line printed is a
    // compact (<1.5 KB) headline JSON with a representative query
    // subset that always fits the tail window intact.
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(med)},"queries_min":${jsonMap(mins)},"total_min":$totalMin%.3f,"sf":"$sfDir","iters":$iters,"iters_completed":$itersCompleted}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench_full.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val medMap = med.toMap
    val headKvs = headline.flatMap(n => medMap.get(n).map(n -> _))
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(headKvs)},"total_min":$totalMin%.3f,"n_queries":${names.length},"full":"/tmp/bench_full.json","sf":"$sfDir","iters":$iters,"iters_completed":$itersCompleted}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    // Emit the parseable line LAST so no later output (Spark shutdown
    // logs, sbt's "[success]") can push it out of the tail window.
    println(json)
    System.err.println(json)
  }
}
