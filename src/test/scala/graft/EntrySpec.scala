package graft

/** Guards the driver's first contact with the library: `SparkEntry.entry`
  * must plan and return rows on the sf0.001 snapshot (the driver
  * smoke-checks rows > 0 before anything else runs — a regression here
  * voids the whole round regardless of per-query correctness).
  */
class EntrySpec extends SparkSpec {
  test("entry() returns a non-empty flagship result") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.nonEmpty)
  }
}
