package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the PLATFORM path for skew mitigation next to the planned one
  * ([[Skew.saltedJoin]], oracle-gated via `q_skew_salted`): AQE's
  * runtime skew-join splitting detects an oversized shuffle partition
  * on a planted-hot-key sort-merge join and splits it, visible as
  * `skew=true` on the SMJ node of the FINAL adaptive plan. On a real
  * cluster this is the first line of defense (no plan changes, reacts
  * to the skew actually observed at runtime); salting remains the
  * planned fix for joins AQE can't split (e.g. when the skewed side
  * must also aggregate on the join key, or for deterministic
  * replication of a hot dim). Thresholds are lowered test-side — the
  * defaults (256 MB partitions, factor 5) are cluster-scale sizes.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a planted-skew sort-merge join (skew=true in the final plan)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // force a shuffle join: the point is skew-splitting, not broadcast
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // test-scale thresholds: a partition is "skewed" above 64 KB and
    // 2x the median, and splits target 16 KB chunks
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // one hot key (0) carrying ~50k wide-ish rows; 7 cold keys
    val fact = s.range(0, 52000)
      .select(when($"id" < 50000, 0L).otherwise(pmod($"id", lit(8L))).as("k"),
        concat(lit("payload_"), $"id").as("payload"))
    val dim = s.range(0, 8).select($"id".as("k"), concat(lit("dim_"), $"id").as("attr"))

    val joined = fact.join(dim, "k")
    // collect() drives THIS Dataset's queryExecution (count() would
    // plan and adaptively execute a different query)
    val rows = joined.collect()
    assert(rows.length === 52000, "inner join on complete dim keeps every fact row")

    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), "adaptive execution must have run")
    assert(finalPlan.contains("skew=true"),
      s"expected AQE to mark the hot-key SMJ partition as skewed; plan was:\n$finalPlan")

    // and the result is unaffected by the split — same totals per key
    val perKey = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perKey(0L) === 50000 + 250 && perKey.size === 8)
  }
}
