package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Scale-up invariants: run headline operators on a 10×-unioned fact
  * table (~6M lineitem rows from sf0.1... here 10× sf0.001 to keep CI
  * fast) and check the algebraically predictable relationships
  * against the 1× results. Catches shapes that only work at the
  * development SF (memory blowups, driver collects, partition
  * assumptions).
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li1 = Tables.lineitem(spark, sf0001)
  private lazy val li10 = (1 to 10).map(_ => li1).reduce(_ union _).repartition(16)

  test("pricing summary scales linearly under 10x duplication") {
    val one = Relational.pricingSummary(li1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(5), r.getLong(7))).toMap
    val ten = Relational.pricingSummary(li10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(5), r.getLong(7))).toMap
    assert(one.keySet == ten.keySet)
    one.foreach { case (k, (sumQty, avgQty, n)) =>
      val (sumQty10, avgQty10, n10) = ten(k)
      assert(n10 == 10 * n, s"count not linear for $k")
      assert(math.abs(sumQty10 - 10 * sumQty) < 1e-4, s"sum not linear for $k")
      assert(math.abs(avgQty10 - avgQty) < 1e-6, s"avg not invariant for $k")
    }
  }

  test("bearly sum scales linearly under 10x duplication") {
    val one = core.Bearly.sumRow(li1)
    val ten = core.Bearly.sumRow(li10)
    (0 until one.length).foreach { i =>
      assert(ten.getLong(i) == 10 * one.getLong(i))
    }
  }

  test("distinct results are invariant under duplication") {
    val one = Relational.distinctFlagStatus(li1).collect().toSeq
    val ten = Relational.distinctFlagStatus(li10).collect().toSeq
    assert(one == ten)
  }

  private lazy val docs1 = Tables.documents(spark, sf0001)
  private lazy val docs5 =
    (0 until 5).map(i => docs1.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ union _).repartition(16)

  test("dedup signatures and sampling are invariant per doc under 5x corpus growth") {
    // content-derived values must not depend on corpus size or
    // partitioning — each replica block gets identical signatures
    val s1 = operators.Dedup.simhash(docs1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s5 = operators.Dedup.simhash(docs5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s5.size == 5 * s1.size)
    s1.foreach { case (id, v) => assert(s5(id) == v && s5(id + 1000000L) == v) }
    // hash sampling picks each doc by its own key only
    val h1 = analysisSampleIds(docs1)
    val h5 = analysisSampleIds(docs5)
    assert(h1.subsetOf(h5))
  }

  private def analysisSampleIds(d: org.apache.spark.sql.DataFrame) =
    operators.TextAnalysis.hashSample(d, 10).collect().map(_.getLong(0)).toSet

  test("decontamination flags scale with the replicated corpus") {
    // replicas of a contaminated doc must all be flagged; the eval set
    // stays doc_id%50==0 so replica blocks contribute new eval docs too
    val base = operators.Dedup.decontaminate(docs1).filter(col("contaminated")).count()
    val five = operators.Dedup.decontaminate(docs5).filter(col("contaminated")).count()
    // every originally-contaminated doc appears 5x; replication can only
    // add contamination (shared shingles across replica blocks)
    assert(five >= 5 * base, s"contaminated: 1x=$base 5x=$five")
  }

  test("connected components handle a 5x-replicated pair graph") {
    val pairs1 = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val pairs5 = (0 until 5).map(i => pairs1
        .withColumn("doc_a", col("doc_a") + lit(i * 100L))
        .withColumn("doc_b", col("doc_b") + lit(i * 100L)))
      .reduce(_ union _)
    val out = operators.Dedup.connectedGroups(pairs5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { i =>
      assert(out(1L + i * 100) == 1L + i * 100)
      assert(out(3L + i * 100) == 1L + i * 100)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB shape this pins: a selective dim filter should reach
    // the FACT scan as a runtime bloom filter (semi-join reduction)
    // when the join is too big to broadcast — rows that cannot match
    // die at the scan instead of crossing the shuffle. Thresholds are
    // forced because CI data is tiny; on a cluster the defaults
    // (creation side < 10 MB, application side > 10 GB) gate it.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = Tables.lineitem(s2, sf0001)
    val ord = Tables.orders(s2, sf0001).filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter injected on the fact side:\n$plan")
    // and the filter is transparent: same result as the plain join in
    // the default session
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("round-4 operators are invariant under repartitioning") {
    val docs = Tables.documents(spark, sf0001)
    val orders = Tables.orders(spark, sf0001)
    val events = Tables.events(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    assert(rows(operators.TextAnalysis.tfidfTopTerms(docs)) ==
      rows(operators.TextAnalysis.tfidfTopTerms(docs.repartition(7))))
    assert(rows(operators.TextAnalysis.bm25Search(docs)) ==
      rows(operators.TextAnalysis.bm25Search(docs.repartition(7))))
    assert(rows(operators.EventOps.scd2Intervals(events)) ==
      rows(operators.EventOps.scd2Intervals(events.repartition(7))))
    assert(rows(Relational.applyChangeSet(Tables.customer(spark, sf0001))) ==
      rows(Relational.applyChangeSet(Tables.customer(spark, sf0001).repartition(7))))
    assert(rows(Relational.priceHistogram(orders)) ==
      rows(Relational.priceHistogram(orders.repartition(7))))
    // the composed dedup pipeline (exact → LSH → CC → keep set) must
    // give the same keep set under any partitioning — CC determinism
    // and banded-join determinism composed
    assert(rows(operators.Dedup.pipelineKeepSet(docs)) ==
      rows(operators.Dedup.pipelineKeepSet(docs.repartition(7))))
  }

  test("funnel and cohort counts scale linearly under user-shifted replication") {
    // 5 disjoint user populations with identical journeys: every
    // per-step funnel count and every cohort cell must scale by
    // exactly 5 — catches any shape that keys on something other
    // than the user (or collapses users across replicas)
    val ev1 = Tables.events(spark, sf0001)
    val ev5 = (0 until 5).map(i => ev1
      .withColumn("user_id", col("user_id") + lit(i * 1000000L))
      .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
      .reduce(_ union _).repartition(16)
    val f1 = operators.EventOps.funnelSteps(ev1).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val f5 = operators.EventOps.funnelSteps(ev5).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    f1.foreach { case (step, n) => assert(f5(step) == 5 * n, s"step $step") }
    val c1 = operators.EventOps.cohortMatrix(ev1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c5 = operators.EventOps.cohortMatrix(ev5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(c1.keySet == c5.keySet)
    c1.foreach { case (cell, n) => assert(c5(cell) == 5 * n, s"cell $cell") }
  }

  test("shingle novelty is invariant under within-source duplication") {
    // duplicating documents INSIDE their sources adds no new distinct
    // (source, shingle) rows — novelty must not move (catches any
    // accidental dependence on doc counts rather than vocabulary)
    val d1 = docs1
    val d2 = docs1.union(docs1.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      .repartition(16)
    val n1 = operators.Dedup.ngramNovelty(d1).collect().toSeq
    val n2 = operators.Dedup.ngramNovelty(d2).collect().toSeq
    assert(n1 == n2)
  }

  test("kCorePeel is invariant under duplicated edge rows") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val once = g.toDF("doc_a", "doc_b")
    val thrice = (g ++ g ++ g).toDF("doc_a", "doc_b").repartition(8)
    val r1 = operators.Graph.kCorePeel(once).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val r3 = operators.Graph.kCorePeel(thrice).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(r1 == r3)
  }

  test("shard placement is content-addressed: manifest scales linearly under 5x growth") {
    // placement keys on payload md5, never on doc_id or corpus size —
    // 5 replicas of every payload land in the same shards, so every
    // shard's asset and byte counts scale exactly 5x
    val m1 = operators.Multimodal.shardManifest(docs1, nShards = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val m5 = operators.Multimodal.shardManifest(docs5, nShards = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m1.keySet == m5.keySet)
    m1.foreach { case (shard, (n, bytes)) =>
      assert(m5(shard) == ((5 * n, 5 * bytes)), s"shard $shard") }
  }

  test("two-level global rank is bucket-count-invariant on real data (gini, weighted median)") {
    // The scale mechanism (percentile-bucket binning + partitioned
    // in-bucket windows + bounded offset table) must reproduce the
    // single-sort answer for ANY bucket count on the real per-customer
    // spend distribution — ties, skew and all.
    val orders = Tables.orders(spark, sf0001)
    val gs = Seq(2, 7, 32).map(b =>
      Relational.giniCustomerSpend(orders, nBuckets = b).collect().head.getDouble(2))
    assert(gs.distinct.length == 1, gs.toString)
    val li = Tables.lineitem(spark, sf0001)
    val ms = Seq(2, 7, 32).map(b =>
      Relational.weightedMedianPrice(li, nBuckets = b).collect().head.getDouble(1))
    assert(ms.distinct.length == 1, ms.toString)
  }
}
