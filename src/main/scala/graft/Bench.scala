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
    // Warm EVERY query once on the smallest SF: warmup exists to trigger
    // codegen/janino/JIT/classloading, and that fixed cost dominates the
    // timed rounds when paid cold (r6: headline-only warmup left round 1
    // at ~210 s cold vs ~85 s warm, so the time-box predictor — which
    // extrapolates from the COLD round — never started round 2 and no
    // warm min/median existed in the driver artifact). A full sf0.001
    // sweep costs ~100 s (measured), buys a ~3× cheaper round 1, and
    // still leaves budget for ≥2 timed rounds. (r5's mistake was warming
    // the full fleet TWICE; once is the right trade.)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val qmap: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      SparkEntry.queries
    // Warmup runs 4 queries CONCURRENTLY: sf0.001 jobs are tiny (most
    // of their wall time is driver-side planning/janino, which
    // parallelizes cleanly across Spark's FIFO scheduler), and warmup
    // timings are never reported — only the codegen/JIT side effect
    // matters. Measured: sequential warmup grew to ~149 s at 249
    // queries and started eating the timed rounds' budget.
    locally {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = qmap.toSeq.sortBy(_._1).map { case (name, fn) =>
        scala.concurrent.Future {
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs), scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
    }
    System.err.println(f"[bench] full warmup done at ${(System.nanoTime() - wallStart) / 1e9}%.1f s")
    // Round structure: ONE full-set round (all 179 queries — complete
    // per-query coverage), then headline-only rounds (27 keys, ~4×
    // cheaper) until the time box closes. The full round after a full
    // sf0.001 warmup is already near-warm; the headline rounds supply
    // the reproducible warm min/median for exactly the keys the
    // round-over-round comparison reads. (r6 ran full-set rounds only:
    // the cold round-1 time fed the predictor, round 2 never started,
    // and the driver artifact had no warm numbers at all.)
    //
    // The whole loop is TIME-BOXED: the driver kills the bench process at
    // a fixed wall deadline (r5: rc=124, no JSON, parsed null). Two
    // defenses: (a) a round only STARTS if the previous same-kind round
    // ×1.2 variance headroom still fits inside 95% of the budget;
    // (b) the compact JSON line is printed AFTER EVERY ROUND, so even a
    // mid-round kill leaves the last complete round's parseable line in
    // the output tail.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "4").toInt
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "420").toDouble
    def elapsedS: Double = (System.nanoTime() - wallStart) / 1e9
    val allNames = qmap.keys.toSeq.sorted
    val headSet = headline.toSet
    val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]

    def runRound(names: Seq[String]): Double = {
      val r0 = System.nanoTime()
      runs += names.map { name =>
        val t0 = System.nanoTime()
        try qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      (System.nanoTime() - r0) / 1e9
    }

    // True median: for an even sample count average the middle pair —
    // s(len/2) alone would report the MAX of 2 samples and bias the
    // headline high against odd-iteration baselines.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")

    // The harness captures only the TAIL of the process output, so a
    // single JSON line carrying all 179 per-query medians (~4 KB) gets
    // its head truncated and fails to parse (round-4 lesson:
    // BENCH_r04.json "parsed": null). Split the report: full per-query
    // detail (median + min) goes to /tmp/bench_full.json; the line
    // printed is a compact (<1.5 KB) headline JSON that always fits the
    // tail window intact.
    def emit(last: Boolean): String = {
      val itersCompleted = runs.length
      val byName = allNames.map(n => n -> runs.toSeq.flatMap(_.toMap.get(n)))
        .filter(_._2.nonEmpty)
      val med = byName.map { case (n, xs) => n -> median(xs) }
      val mins = byName.map { case (n, xs) => n -> xs.min }
      val total = med.map(_._2).sum
      val totalMin = mins.map(_._2).sum
      val full =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(med)},"queries_min":${jsonMap(mins)},"total_min":$totalMin%.3f,"sf":"$sfDir","iters":$iters,"iters_completed":$itersCompleted}"""
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench_full.json"),
          (full + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
      val minMap = mins.toMap
      val headKvs = med.filter(kv => headSet.contains(kv._1))
      val headMinKvs = headline.flatMap(n => minMap.get(n).map(n -> _))
      val json =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(headKvs)},"queries_min":${jsonMap(headMinKvs)},"total_min":$totalMin%.3f,"n_queries":${byName.length},"full":"/tmp/bench_full.json","sf":"$sfDir","iters":$iters,"iters_completed":$itersCompleted}"""
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
          (json + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
      if (!last) { println(json); System.err.println(json) }
      json
    }

    var lastFullS = runRound(allNames)
    System.err.println(f"[bench] full round done at $elapsedS%.1f s (round $lastFullS%.1f s, budget $budgetS%.0f s)")
    emit(last = false)
    // Estimate the first headline round from the full round's own
    // headline keys; after that, predict from the previous headline
    // round. 20% headroom — round-to-round swings of ~1.5× are real
    // under GC/codegen pressure, and the per-round emit above caps the
    // damage of an overrun at one lost round.
    var lastHeadS = runs.head.filter(kv => headSet.contains(kv._1)).map(_._2).sum
    var i = 1
    while (i < iters && elapsedS + lastHeadS * 1.2 < budgetS * 0.95) {
      lastHeadS = runRound(headline)
      i += 1
      System.err.println(f"[bench] headline round $i/$iters done at $elapsedS%.1f s (round $lastHeadS%.1f s, budget $budgetS%.0f s)")
      emit(last = false)
    }
    val json = emit(last = true)
    spark.stop()
    // Emit the parseable line LAST so no later output (Spark shutdown
    // logs, sbt's "[success]") can push it out of the tail window.
    println(json)
    System.err.println(json)
  }
}
