package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join for hot keys.
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime, but
  * when a dimension join must shuffle (dim too big to broadcast) and
  * a handful of keys dominate, salting is the planned fix: append a
  * deterministic salt ∈ [0, buckets) to the fact side's key and
  * explode the dim side once per salt value, so a hot key's rows
  * spread over `buckets` reducers instead of one straggler.
  *
  * Trade: dim side is replicated ×buckets (choose buckets ≈ the
  * skew factor, not more); results are identical to the unsalted
  * join — verified by the differential spec.
  */
object Skew {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, salted into
    * `buckets` sub-keys. The fact-side salt hashes the FULL row
    * (xxhash64 over every column) — uniform even when a hot key's
    * rows are identical in the key column, and deterministic under
    * task retry / repartition (unlike `monotonically_increasing_id`,
    * whose value depends on partition layout). The join RESULT is
    * independent of salt values (only the shuffle distribution
    * changes). Dim side is exploded across all salts.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, buckets: Int = 8): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Oracle-checkable face of [[saltedJoin]]: lineitem⋈supplier on
    * suppkey (the canonical "fact keyed on a skewable dim" shape)
    * salted into 8 buckets, aggregated to per-nation line counts and
    * quantity totals. The DuckDB oracle is the PLAIN unsalted join —
    * salting must be invisible in the result, only the shuffle
    * distribution changes — so the invariance the differential spec
    * pins locally is also enforced end-to-end by the driver gate.
    */
  def saltedSupplierSummary(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    saltedJoin(lineitem, supplier, "l_suppkey", "s_suppkey", 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
}
