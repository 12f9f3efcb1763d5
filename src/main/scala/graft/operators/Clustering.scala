package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering for write layouts.
  *
  * A 100 TB table is pruned or it is scanned: parquet keeps min/max
  * stats per file and row group, but a layout sorted on ONE column
  * localizes only that column — a predicate on a second dimension
  * still touches every file. Z-ordering interleaves the bits of two
  * dimensions into one sort key, so a range-partitioned write is
  * simultaneously localized in BOTH columns and 2-D predicates skip
  * most files on their stats (the technique behind
  * Databricks/Iceberg/Hudi Z-ORDER clustering).
  *
  * The z-value is built from built-in bitwise expressions only
  * (shiftleft/shiftright/bitwiseAND over longs) — a static 2·bits-term
  * expression tree that whole-stage codegen collapses to straight-line
  * JVM bit arithmetic; no UDF, no custom Expression needed.
  */
object Clustering {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. The
    * terms write disjoint bits, so plain addition assembles the word.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL, for oracle generation. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-value per event over (user bucket, hour bucket) — the audit
    * projection of the clustering key, oracle-checked bit-for-bit.
    * user_id and the hour index are masked to 16 bits; events
    * timestamps are post-1970 here so the hour index is non-negative
    * (the floor-division contract gapFilledHourlyCounts documents).
    */
  def eventZValues(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000
    EventOps.withTsUs(events)
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(0xFFFFL)).as("x"),
        expr(s"ts_us div $hourUs").bitwiseAND(lit(0xFFFFL)).as("y"))
      .withColumn("zval", zValue(col("x"), col("y")))
      .orderBy("event_id")
  }

  /** Range-partition on the z-value and sort within partitions before
    * writing: each output file then covers a contiguous z-range —
    * i.e. a small rectangle in (x, y) space — so parquet min/max
    * stats on BOTH columns are tight per file. `nFiles` stands in for
    * target-file-size tuning on a cluster.
    */
  def zOrderWrite(df: DataFrame, x: Column, y: Column, path: String,
                  nFiles: Int): Unit =
    df.withColumn("zval", zValue(x, y))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)
}
