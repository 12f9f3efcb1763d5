package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth: the engine's tables round-trip through the
  * other mainstream formats (csv, json, partitioned parquet) with
  * schema preserved — the "sources/sinks" row of SURVEY §2.2.
  */
class SourcesSpec extends SparkSpec {

  test("csv round-trip preserves rows and (declared) schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val nation = Tables.nation(spark, sf0001)
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(nation.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json lines round-trip") {
    val dir = Files.createTempDirectory("graft_json").toString
    val region = Tables.region(spark, sf0001)
    region.write.mode("overwrite").json(dir)
    val back = spark.read.schema(region.schema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("maxRecordsPerFile bounds output file sizes (compaction control)") {
    val dir = Files.createTempDirectory("graft_sized").toString
    Tables.lineitem(spark, sf0001).coalesce(1)
      .write.mode("overwrite").option("maxRecordsPerFile", 1000).parquet(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, s"expected multiple bounded files, got ${files.length}")
    val total = spark.read.parquet(dir).count()
    assert(total == Tables.lineitem(spark, sf0001).count())
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("graft_part").toString
    val orders = Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1997)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"partition filter not applied:\n$plan")
    assert(pruned.count() ==
      orders.filter(year(col("o_orderdate")) === 1997).count())
  }
}
