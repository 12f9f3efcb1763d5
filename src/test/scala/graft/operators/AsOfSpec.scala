package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join: backward semantics, ties, and no-match nulls") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 101.0), (2L, 5L, 50.0))
      .toDF("qkey", "qt", "px")
    val trades = Seq((1L, 5L), (1L, 15L), (1L, 20L), (1L, 25L), (2L, 5L), (3L, 99L))
      .toDF("tkey", "tt")
    val out = AsOf.join(trades, quotes, "tkey", "qkey", "tt", "qt")
      .select("tkey", "tt", "qt", "px")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(out == Set(
      (1L, 5L, None),        // before first quote
      (1L, 15L, Some(10L)),  // strictly between
      (1L, 20L, Some(20L)),  // tie: at-or-before includes equal time
      (1L, 25L, Some(20L)),  // after last
      (2L, 5L, Some(5L)),    // tie on other key
      (3L, 99L, None)))      // key with no right rows
  }

  test("native as-of join equals the window-based formulation on real events") {
    val e = EventOps.withTsUs(Tables.events(spark, sf0001))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("view_us"))
    val native = AsOf.join(purchases, views, "user_id", "v_user", "ts_us", "view_us")
      .groupBy("event_id", "user_id", "ts_us")
      .agg(max("view_us").as("last_view_us")) // defensive: should already be 1 row per left row
      .select("event_id", "user_id", "ts_us", "last_view_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val windowed = EventOps.lastViewBeforePurchase(Tables.events(spark, sf0001))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(native == windowed)
  }

  test("tolerance: stale matches emit nulls, pointer state survives for later rows") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 101.0)).toDF("qkey", "qt", "px")
    val trades = Seq((1L, 12L), (1L, 30L), (1L, 21L)).toDF("tkey", "tt")
    val out = AsOf.join(trades, quotes, "tkey", "qkey", "tt", "qt", tolerance = Some(5L))
      .select("tt", "qt").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // tt=12: match qt=10, gap 2 ≤ 5 ✓; tt=21: qt=20, gap 1 ✓;
    // tt=30: best is still qt=20 but gap 10 > 5 → null (not dropped)
    assert(out == Map(12L -> Some(10L), 21L -> Some(20L), 30L -> None))
  }

  test("tolerance twin equals the window formulation with a staleness post-filter") {
    val events = Tables.events(spark, sf0001)
    val tolUs = 30L * 60 * 1000000
    val native = EventOps.lastViewWithinNative(events, toleranceMinutes = 30)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val windowed = EventOps.lastViewBeforePurchase(events)
      .select(col("event_id"), col("ts_us"),
        when(col("last_view_us") >= col("ts_us") - tolUs, col("last_view_us")).as("lv"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(native == windowed)
    assert(native.values.exists(_.isEmpty) && native.values.exists(_.nonEmpty),
      "fixture lacks both stale and fresh matches — tolerance not exercised")
  }

  test("native as-of join emits exactly one row per left row") {
    val e = EventOps.withTsUs(Tables.events(spark, sf0001))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("view_us"))
    val n = AsOf.join(purchases, views, "user_id", "v_user", "ts_us", "view_us").count()
    assert(n == purchases.count())
  }

  test("null keys never match (SQL join semantics)") {
    val quotes = Seq((Some(1L), 10L, 1.0), (None, 5L, 2.0))
      .toDF("qkey", "qt", "px")
    val trades = Seq((Some(1L), 15L), (None, 15L))
      .toDF("tkey", "tt")
    val out = AsOf.join(trades, quotes, "tkey", "qkey", "tt", "qt")
      .select("tkey", "qt").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // keyed trade matches its quote; null-keyed trade matches nothing
    // (and never matches the null-keyed quote)
    assert(out == Set((Some(1L), Some(10L)), (None, None)))
  }

  test("facade rejects unknown columns with a naming error") {
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq((1L, 2L)).toDF("k2", "t2")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "nope", "k2", "t", "t2")
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("k, t"))
  }

  test("as-of plan shape: co-partitioned exchanges, no cartesian blow-up") {
    val e = EventOps.withTsUs(Tables.events(spark, sf0001))
    val l = e.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts_us"))
    val r = e.filter(col("event_type") === "view").select(col("user_id").as("vu"), col("ts_us").as("vt"))
    val df = AsOf.join(l, r, "user_id", "vu", "ts_us", "vt")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "as-of should not fall back to nested-loop shapes")
  }
}
