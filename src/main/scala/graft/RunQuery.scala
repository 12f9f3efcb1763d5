package graft

import org.apache.spark.sql.SparkSession

/** Debug main: run one named SparkEntry query `reps` times, print row
  * count and per-rep wall time (rep drift exposes JVM-state leaks).
  * `runMain graft.RunQuery <name> [sfDir] [reps]`
  *
  * ACTION PARITY: the default action is the same noop-sink write
  * Bench times — `count()` (the pre-round-12 default, kept via
  * `SPARK_GRAFT_RUNQUERY_ACTION=count`) lets the optimizer DELETE the
  * final presentation sort and every column the count doesn't need
  * (`EliminateSorts` + pruning through the last aggregate), which
  * round 12 measured as a 30× blind spot: ev_interval_join
  * "reproduced" at 1.2 s under count() while the bench's noop write
  * of the same query ran 36 s (the range sort's sampling pass
  * re-executing the window pipeline). Adjudicating a bench number
  * with a count() is comparing different plans.
  *
  * Heap sizing (`SPARK_DRIVER_MEM`, default 8 g — in local mode the
  * driver IS the executor): the 8 g default covers the verify (sf0.01)
  * and bench (sf0.1) gates and, post-round-11, every individually
  * measured sf10 key; run full scale-decade SUITES at 24-48 g for
  * headroom. Measured table: SCALING.md "Round-11 memory contract".
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val useCount = sys.env.get("SPARK_GRAFT_RUNQUERY_ACTION").contains("count")
    // SPARK_GRAFT_RUNQUERY_EXPLAIN=1: dump the formatted physical plan
    // once before the timed reps (plan inspection without a spec)
    if (sys.env.get("SPARK_GRAFT_RUNQUERY_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val rows =
        if (useCount) df.count().toString
        else {
          df.write.format("noop").mode("overwrite").save()
          "n/a" // noop action never counts; a -1 sentinel reads as a row count
        }
      println(f"[runquery] $name rep=$r rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
