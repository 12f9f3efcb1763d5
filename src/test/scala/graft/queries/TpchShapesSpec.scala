package graft.queries

import graft.{SparkSpec, Tables}

/** Plan-shape assertions for the TPC-H optimizer-breadth pack: each
  * query exists to force a distinct Catalyst path, so the spec checks
  * that the path is actually taken — results are pinned separately by
  * the DuckDB oracle gate.
  */
class TpchShapesSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q4: EXISTS plans as a left semi join with the non-equi shipdate conjunct") {
    val plan = executedPlan(TpchShapes.orderPriorityCheck(
      Tables.orders(spark, sf0001), Tables.lineitem(spark, sf0001)))
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(plan.contains("l_shipdate"), "non-equi conjunct lost")
  }

  test("q15: argmax scalar join plans as a hash join, not a nested loop") {
    // join(broadcast(1-row max)) + equality filter: Catalyst folds the
    // filter into the join condition, so the plan is a hash join — the
    // cross-join shape never survives to execution.
    val plan = executedPlan(TpchShapes.topSupplier(
      Tables.supplier(spark, sf0001), Tables.lineitem(spark, sf0001)))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"argmax join degenerated to a nested loop:\n$plan")
  }

  test("q16: NOT IN with non-nullable keys plans as a hash anti join") {
    val plan = executedPlan(TpchShapes.supplierCountSql(
      Tables.lineitem(spark, sf0001), Tables.part(spark, sf0001),
      Tables.supplier(spark, sf0001)))
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "null-aware anti degenerated to cartesian")
  }

  test("q10/q18: top-k finishers are bounded heaps, not global sorts") {
    val p10 = executedPlan(TpchShapes.returnedItemRevenue(
      Tables.customer(spark, sf0001), Tables.orders(spark, sf0001),
      Tables.lineitem(spark, sf0001), Tables.nation(spark, sf0001)))
    val p18 = executedPlan(TpchShapes.largeVolumeOrders(
      Tables.customer(spark, sf0001), Tables.orders(spark, sf0001),
      Tables.lineitem(spark, sf0001)))
    assert(p10.contains("TakeOrderedAndProject"), s"q10 global-sorts:\n$p10")
    assert(p18.contains("TakeOrderedAndProject"), s"q18 global-sorts:\n$p18")
  }

  test("q7: nation dims broadcast; disjunctive pair filter survives") {
    val plan = executedPlan(TpchShapes.volumeShipping(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001),
      Tables.customer(spark, sf0001), Tables.supplier(spark, sf0001),
      Tables.nation(spark, sf0001)))
    assert(plan.contains("BroadcastHashJoin"), s"nation dims not broadcast:\n$plan")
  }

  test("q13: double aggregation keeps partial/final split on the outer count") {
    val plan = executedPlan(TpchShapes.custOrderDistribution(
      Tables.customer(spark, sf0001), Tables.orders(spark, sf0001)))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"missing partial/final aggregates:\n$plan")
  }

  test("q12: high+low split partitions every joined line exactly once") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val out = TpchShapes.priorityByFlag(li, ord).collect()
    assert(out.nonEmpty)
    val total = li.filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .join(ord, col("o_orderkey") === col("l_orderkey")).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == total)
  }
}
