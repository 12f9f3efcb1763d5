package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity facade: the complete public surface of
  * WillAyd/bearly (reference `src/bearly/bearly_ext.cc:216-220`
  * exports exactly `sum`, `produce_array`, `produce_stream`),
  * re-expressed on the public Spark DataFrame API.
  *
  * Not a port: no chunk loops, no manual accumulators. `sum` builds a
  * declarative global aggregate; Catalyst plans it as
  * HashAggregate(partial) -> Exchange -> HashAggregate(final), which
  * distributes the reference's per-chunk accumulation
  * (bearly_ext.cc:61-76) across executors for free.
  */
object Bearly {

  /** Multi-column whole-table sum with type-based implicit projection.
    *
    * Semantics pinned by reference `bearly_ext.cc:9-111` +
    * `tests/test_bearly.py:23-39`:
    *   - only INT64 (LongType) columns participate; int32 / float /
    *     string / everything else is silently dropped
    *     (`bearly_ext.cc:33-39` admits only NANOARROW_TYPE_INT64);
    *   - nulls count as 0 (`value_or(0)`, `bearly_ext.cc:70-73`) and
    *     an empty/all-null column sums to 0, NOT NULL — hence the
    *     `coalesce(sum, 0L)`: Spark's `sum` alone yields NULL there;
    *   - output is a single row; columns keep source names and types,
    *     ordered by ascending source column index
    *     (`bearly_ext.cc:28,47-56`);
    *   - int64 overflow wraps (ANSI off, see [[graft.GraftSession]]).
    *
    * Scale: a global aggregate over N long columns is one map-side
    * partial pass + a 1-row shuffle — the cheapest possible shape; no
    * further tuning needed at 100 TB. Column pruning means the parquet
    * scan reads only the selected long columns.
    */
  def sum(df: DataFrame): DataFrame = {
    val longCols = df.schema.fields.collect {
      case f if f.dataType == LongType => f.name
    }
    if (longCols.isEmpty) {
      // Reference emits a 0-column 1-row struct when nothing is
      // summable (bearly_ext.cc:46 with an empty accumulator map).
      df.sparkSession.range(1).select()
    } else {
      df.select(longCols.map(col): _*)
        .agg(
          coalesce(org.apache.spark.sql.functions.sum(col(longCols.head)), lit(0L)).as(longCols.head),
          longCols.tail.map(c => coalesce(org.apache.spark.sql.functions.sum(col(c)), lit(0L)).as(c)): _*)
    }
  }

  /** Eager form of [[sum]] — the reference's `sum` is eager (it
    * returns a materialized single-batch stream, bearly_ext.cc:93-110),
    * so the facade offers both: `sum` keeps the plan lazy/composable
    * (SURVEY §3.3 decision: laziness documented), `sumRow` matches
    * the reference's eagerness by materializing the single row.
    */
  def sumRow(df: DataFrame): Row = sum(df).head()

  /** `produce_array`: int64 column `awesome_numbers = [42, 555, null]`
    * (reference `bearly_ext.cc:113-157`, golden at test_bearly.py:6-10).
    */
  def produceArray(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Some(42L), Some(555L), None).toDF("awesome_numbers")
  }

  /** `produce_stream`: table `struct<column0: int32, column1: int64>`
    * rows (42,555), (84,1110), (null,null)
    * (reference `bearly_ext.cc:159-214`, golden at test_bearly.py:12-21).
    */
  def produceStream(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("column0", IntegerType, nullable = true),
      StructField("column1", LongType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(42, 555L), Row(84, 1110L), Row(null, null))
    spark.createDataFrame(rows, schema)
  }
}
