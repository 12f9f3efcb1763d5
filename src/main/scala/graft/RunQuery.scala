package graft

import org.apache.spark.sql.SparkSession

/** Debug main: run one named SparkEntry query, print row count and
  * wall time. `runMain graft.RunQuery <name> [sfDir]`
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"[runquery] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
