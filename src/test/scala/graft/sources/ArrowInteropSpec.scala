package graft.sources

import graft.SparkSpec
import graft.core.Bearly
import org.apache.spark.sql.functions._

class ArrowInteropSpec extends SparkSpec {
  import spark.implicits._

  test("bearly produce_stream round-trips through Arrow IPC with nulls intact") {
    val df = Bearly.produceStream(spark)
    val bytes = ArrowInterop.toArrowBytes(df)
    // dump for external-consumer validation (pyarrow reads this file)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_arrow_stream.bin"), bytes)
    val back = ArrowInterop.fromArrowBytes(spark, bytes)
    assert(back.schema == df.schema)
    val rows = back.orderBy(col("column0").asc_nulls_first).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
    assert(rows.toSeq == Seq((null, null), (42, 555L), (84, 1110L)))
  }

  test("query results round-trip: mixed long/double/string/bool columns") {
    val df = Seq(
      (1L, 1.5, "a", true),
      (2L, -0.25, "β unicode", false))
      .toDF("id", "x", "s", "b")
    val back = ArrowInterop.fromArrowBytes(spark, ArrowInterop.toArrowBytes(df))
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("IPC bytes start with a valid Arrow stream (readable by any Arrow consumer)") {
    val bytes = ArrowInterop.toArrowBytes(Bearly.produceArray(spark))
    // stream format: first message is the schema, length-prefixed with
    // the 0xFFFFFFFF continuation marker (Arrow IPC spec)
    assert(bytes.length > 8)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xff &&
      (bytes(2) & 0xff) == 0xff && (bytes(3) & 0xff) == 0xff)
  }

  test("unsupported column types are rejected loudly, not silently dropped") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException](ArrowInterop.toArrowBytes(df))
    assert(e.getMessage.contains("arr"))
  }

  test("maxRows bounds the export") {
    val df = spark.range(1000).toDF("id")
    val back = ArrowInterop.fromArrowBytes(spark, ArrowInterop.toArrowBytes(df, maxRows = 10))
    assert(back.count() == 10)
  }
}
