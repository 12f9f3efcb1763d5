package graft.core

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden tests mirroring the reference's pytest suite
  * (/root/reference/tests/test_bearly.py:6-39) plus partition- and
  * null-invariance properties the reference's chunk loop implies.
  */
class BearlySpec extends SparkSpec {
  import spark.implicits._

  test("produceArray matches reference golden (test_bearly.py:6-10)") {
    val rows = Bearly.produceArray(spark).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSeq == Seq(Some(42L), Some(555L), None))
    assert(Bearly.produceArray(spark).schema ==
      StructType(Seq(StructField("awesome_numbers", LongType, nullable = true))))
  }

  test("produceStream matches reference golden (test_bearly.py:12-21)") {
    val df = Bearly.produceStream(spark)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("column0", IntegerType), ("column1", LongType)))
    val rows = df.collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(rows.toSeq == Seq(
      (Some(42), Some(555L)), (Some(84), Some(1110L)), (None, None)))
  }

  test("sum: mixed types — string dropped, nulls as 0 (test_bearly.py:23-39)") {
    val df = Seq(
      (Some(1L), Some(3L), "foo"),
      (Some(2L), None, "bar"),
      (None, Some(4L), "baz")
    ).toDF("col0", "col1", "col2")
    val out = Bearly.sum(df)
    assert(out.schema.fieldNames.toSeq == Seq("col0", "col1"))
    assert(out.collect().toSeq == Seq(Row(3L, 7L)))
  }

  test("sum: int32 columns are dropped (bearly_ext.cc:33-39 admits only INT64)") {
    val df = Bearly.produceStream(spark) // column0 int32, column1 int64
    val out = Bearly.sum(df)
    assert(out.schema.fieldNames.toSeq == Seq("column1"))
    assert(out.collect().toSeq == Seq(Row(1665L)))
  }

  test("sum: empty input and all-null column yield 0, not NULL") {
    val empty = Seq.empty[(Option[Long], Option[Long])].toDF("a", "b")
    assert(Bearly.sum(empty).collect().toSeq == Seq(Row(0L, 0L)))
    val allNull = Seq[(Option[Long], Option[Long])]((None, None), (None, None)).toDF("a", "b")
    assert(Bearly.sum(allNull).collect().toSeq == Seq(Row(0L, 0L)))
  }

  test("sum: no long columns → 0-column single-row result (bearly_ext.cc:46)") {
    val df = Seq((1, "x")).toDF("i", "s")
    val out = Bearly.sum(df)
    assert(out.schema.isEmpty)
    assert(out.count() == 1)
  }

  test("sum: column order follows source field order") {
    val df = Seq((1L, "x", 2L, 3.0, 4L)).toDF("z", "s", "a", "d", "m")
    assert(Bearly.sum(df).schema.fieldNames.toSeq == Seq("z", "a", "m"))
  }

  test("sumRow materializes the same single row eagerly") {
    val df = Seq((Some(1L), Some(3L)), (Some(2L), None)).toDF("a", "b")
    assert(Bearly.sumRow(df) == Row(3L, 3L))
  }

  test("sum: invariant under repartitioning (reference chunk-invariance)") {
    val df = Tables.lineitem(spark, sf0001)
    val once = Bearly.sum(df).collect().toSeq
    assert(Bearly.sum(df.repartition(13)).collect().toSeq == once)
    assert(Bearly.sum(df.coalesce(1)).collect().toSeq == once)
  }

  test("sum: int64 overflow wraps (ANSI off, matches C++ accumulation)") {
    val df = Seq(Long.MaxValue, 1L).toDF("v")
    assert(Bearly.sum(df).collect().toSeq == Seq(Row(Long.MinValue)))
  }
}
