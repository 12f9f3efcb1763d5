package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey", buckets = 5)
      .groupBy("p_brand").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedSupplierSummary equals the unsalted join summary") {
    val li = Tables.lineitem(spark, sf0001)
    val supp = Tables.supplier(spark, sf0001)
    val plain = li.join(supp, col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = Skew.saltedSupplierSummary(li, supp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == plain && salted.nonEmpty)
  }
}
