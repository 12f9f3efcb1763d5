package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the scan partition count of each testdata
  * table under the session's split sizing — the ground truth behind
  * any `spark.sql.files.maxPartitionBytes` decision (the conf's
  * effective split size also depends on openCostInBytes and the
  * minPartitionNum fallback, so computing it by hand is guesswork).
  * `runMain graft.ScanProbe [sfDir]`, honors
  * SPARK_GRAFT_MAX_PARTITION_BYTES / SPARK_GRAFT_CPUS.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[scanprobe] maxPartitionBytes=" +
      spark.conf.get("spark.sql.files.maxPartitionBytes") +
      s" defaultParallelism=${spark.sparkContext.defaultParallelism}")
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      println(s"[scanprobe] $t: scanPartitions=${df.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
