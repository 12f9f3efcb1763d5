package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean matches sum(x*w)/sum(w)") {
    val df = Seq((1.0, 2.0, "a"), (3.0, 1.0, "a"), (10.0, 4.0, "b"))
      .toDF("x", "w", "g")
    val wavg = udaf(Aggregators.WeightedMean)
    val out = df.groupBy("g").agg(wavg(col("x"), col("w")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 5.0 / 3.0) < 1e-12)
    assert(out("b") == 10.0)
  }

  test("WeightedMean: zero total weight → NaN") {
    val df = Seq((1.0, 0.0)).toDF("x", "w")
    val wavg = udaf(Aggregators.WeightedMean)
    assert(df.agg(wavg(col("x"), col("w"))).collect().head.getDouble(0).isNaN)
  }

  test("TopK keeps the k largest, merging across partitions") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.toDF("v").repartition(7)
    val top3 = udaf(new Aggregators.TopK(3))
    val out = df.agg(top3(col("v")).as("t")).collect().head.getSeq[Double](0)
    assert(out == Seq(100.0, 99.0, 98.0))
  }

  test("TopK agrees with window row_number top-k per group") {
    val orders = Tables.orders(spark, sf0001)
    val top3 = udaf(new Aggregators.TopK(3))
    val viaAgg = orders.groupBy("o_orderpriority")
      .agg(top3(col("o_totalprice")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val viaWindow = graft.queries.Relational.topOrdersPerPriority(orders, 3)
      .collect().groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq }
    assert(viaAgg == viaWindow)
  }

  test("MisraGries: exact when capacity >= distinct keys, any partitioning") {
    val keys = (1L to 20L).flatMap(k => Seq.fill(k.toInt)(k)) // key k occurs k times
    val df = keys.toDF("k").repartition(9)
    val mg = udaf(new Aggregators.MisraGries(64))
    val out = df.agg(mg(col("k")).as("hh"))
      .select(explode(col("hh")).as("p"))
      .select(col("p._1"), col("p._2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 20L).map(k => k -> k).toMap)
  }

  test("MisraGries: capacity < distinct keeps every true heavy hitter, never overcounts") {
    // 5 hot keys at 200 each + 400 singleton keys; N = 1400,
    // capacity 16 → error bound N/16 = 87.5, so hot keys (true count
    // 200 > 87.5) MUST survive any decrement schedule with estimate
    // within [200 - 87.5, 200].
    val keys = (1L to 5L).flatMap(k => Seq.fill(200)(k)) ++ (100L to 499L)
    val df = keys.toDF("k").repartition(11)
    val mg = udaf(new Aggregators.MisraGries(16))
    val out = df.agg(mg(col("k")).as("hh"))
      .select(explode(col("hh")).as("p"))
      .select(col("p._1"), col("p._2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size <= 16)
    (1L to 5L).foreach { k =>
      assert(out.contains(k), s"heavy hitter $k evicted: $out")
      assert(out(k) <= 200L && out(k) >= 200L - 88L, s"estimate out of bound: ${out(k)}")
    }
    out.foreach { case (k, n) =>
      val truth = if (k <= 5L) 200L else 1L
      assert(n <= truth, s"overcount for $k: $n > $truth")
    }
  }

  test("TopKPairs property: equals sort-based top-k on random data, any partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random (sim, cid) rows with duplicate sims (exercises tie-break)
    // and k both under- and over-sized relative to the data
    val rowGen = Gen.listOfN(60, for {
      sim <- Gen.choose(0, 9).map(_ / 10.0)
      cid <- Gen.choose(0L, 999L)
    } yield (sim, cid))
    val params = Gen.Parameters.default
    (1 to 15).foreach { i =>
      val rows = rowGen.pureApply(params, Seed(i.toLong))
        .zipWithIndex.map { case ((s, c), j) => (s, c * 1000 + j) } // unique ids
      val k = 1 + (i % 8)
      val topk = udaf(new Aggregators.TopKPairs(k))
      val got = rows.toDF("sim", "cid").repartition(1 + i % 5)
        .agg(topk(col("sim"), col("cid")).as("t"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      val expect = rows.map { case (s, c) => (s, c) }
        .sortBy(p => (-p._1, p._2)).take(k)
      assert(got.toSeq == expect, s"seed $i k=$k")
    }
  }

  test("MisraGries property: random streams, any partitioning — bounds always hold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    // Zipf-ish keys: a few hot, a long tail
    val keyGen = Gen.frequency(
      5 -> Gen.choose(1L, 3L), 3 -> Gen.choose(10L, 30L), 2 -> Gen.choose(100L, 400L))
    (1 to 10).foreach { i =>
      val keys = Gen.listOfN(300, keyGen).pureApply(params, Seed(1000L + i))
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = keys.size.toLong
      val capacity = Seq(4, 16, 64, 1024)(i % 4)
      val mg = udaf(new Aggregators.MisraGries(capacity))
      val out = keys.toDF("k").repartition(1 + i % 6)
        .agg(mg(col("k")).as("hh"))
        .select(explode(col("hh")).as("p"))
        .select(col("p._1"), col("p._2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.size <= capacity, s"seed $i: summary exceeds capacity")
      out.foreach { case (k, est) =>
        val t = truth.getOrElse(k, 0L)
        assert(est <= t, s"seed $i cap=$capacity: overcount $k: $est > $t")
        assert(est >= t - n / capacity,
          s"seed $i cap=$capacity: undercount beyond bound for $k: $est < $t - ${n / capacity}")
      }
      truth.foreach { case (k, t) =>
        if (t > n / capacity)
          assert(out.contains(k), s"seed $i cap=$capacity: heavy hitter $k (n=$t) missing")
      }
      if (capacity >= truth.size)
        assert(out == truth, s"seed $i: exact regime mismatch")
    }
  }

  test("approx_count_distinct within rsd of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val r = graft.queries.Relational.approxDistinctStats(li).collect().head
    val exact = li.select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(math.abs(r.getLong(0) - exact).toDouble / exact < 0.05)
  }
}
