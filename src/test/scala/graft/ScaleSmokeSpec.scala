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
}
