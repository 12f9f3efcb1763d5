package graft.streaming

import graft.SparkSpec
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    (ts("2024-01-01 10:05:00"), 1L, "click", 1.5),
    (ts("2024-01-01 10:45:00"), 1L, "view", 2.0),
    (ts("2024-01-01 11:05:00"), 2L, "click", 0.5),
    (ts("2024-01-01 12:30:00"), 2L, "purchase", 9.0))

  test("streaming hourlyCounts matches the batch twin (complete mode)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.toMemorySink(
      EventStreams.hourlyCounts(events),
      "hourly_test", org.apache.spark.sql.streaming.OutputMode.Complete())
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_test")
        .select("hour_us", "event_type", "n", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventOps.hourlyCounts(sample.toDF("ts", "user_id", "event_type", "value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming sessionize produces gap-delimited sessions") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.toMemorySink(
      EventStreams.sessionize(events),
      "sess_test", org.apache.spark.sql.streaming.OutputMode.Complete())
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      // all gaps exceed 30 min → 4 singleton sessions (2 per user)
      val out = spark.table("sess_test").collect()
      assert(out.length == 4)
      assert(out.forall(_.getLong(3) == 1L))
      assert(spark.table("sess_test").agg(sum("n_events")).collect().head.getLong(0) == 4L)
    } finally q.stop()
  }

  test("runningUserTotals accumulates state across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .toDF().writeStream.format("memory").queryName("totals_test")
      .outputMode("update").start()
    try {
      mem.addData(EventStreams.UserEvent(1L, "click", 1.0), EventStreams.UserEvent(1L, "view", 2.0))
      q.processAllAvailable()
      mem.addData(EventStreams.UserEvent(1L, "purchase", 4.0))
      q.processAllAvailable()
      val rows = spark.table("totals_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // last update for user 1 must show 3 events, 7.0 total
      assert(rows.contains((1L, 3L, 7.0)))
    } finally q.stop()
  }
}
