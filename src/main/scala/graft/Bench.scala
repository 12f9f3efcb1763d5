package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, materializing each result fully via the noop
  * sink (so projections/aggregations aren't pruned away the way a
  * bare count() would allow). Prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query once on the smallest SF so measured times
    // reflect steady-state execution (plans, codegen, JIT), not
    // first-run compilation — the regime a long-lived cluster runs in.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    // Interleaved rounds (run 1 = all queries, run 2 = all queries, …)
    // so a GC pause / janino-compile storm lands on one ROUND, not one
    // query's every sample. Round-2/3 medians-of-3 still swung up to
    // 9× on identical code; N=5 + reporting BOTH median and min makes
    // real regressions separable from noise: min is the reproducible
    // steady-state cost, median shows the typical run.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val runs: Seq[Seq[(String, Double)]] = (1 to iters).map { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    val names = runs.head.map(_._1)
    val byName = names.map(n => n -> runs.map(_.toMap.apply(n)))
    val med = byName.map { case (n, xs) => n -> median(xs) }
    val mins = byName.map { case (n, xs) => n -> xs.min }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    val totalMin = mins.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(med)},"queries_min":${jsonMap(mins)},"total_min":$totalMin%.3f,"sf":"$sfDir","iters":$iters}"""
    // Three sinks so the metric survives any log-prefixing harness:
    // stdout (human), stderr (sbt passes through un-prefixed), and a
    // file the driver can always read.
    println(json)
    System.err.println(json)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
