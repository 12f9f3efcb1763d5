package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins Spark's runtime bloom-filter join pruning — the third platform
  * scale path documented alongside AQE skew splitting (`AqeSkewSpec`)
  * and AQE coalescing: when a shuffle join's build side carries a
  * selective filter, the optimizer injects
  * `bloom_filter_might_contain` over the probe side's join key so the
  * FACT SCAN discards non-joining rows before the shuffle — at 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling only the ~matching slice. Thresholds are lowered
  * test-side (defaults assume GB-scale scans).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom filter into the fact-side scan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // force a shuffle join (broadcast joins don't need the runtime filter)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // test-scale thresholds: any fact scan qualifies as the application
    // side; the filtered dim qualifies as the creation side
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")

    val li = Tables.lineitem(s, sf0001)
    val supp = Tables.supplier(s, sf0001).filter(col("s_acctbal") > 5000)
    val joined = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("might_contain"),
      s"expected an injected runtime bloom filter on the fact side; plan was:\n$plan")

    // pruning must be invisible in the result
    val expected = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      Tables.lineitem(s2, sf0001)
        .join(Tables.supplier(s2, sf0001).filter(col("s_acctbal") > 5000),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    }
    val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === expected && got.nonEmpty)
  }
}
