package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventStream.{Event, Session}

/** Drives the streaming operators through a MemoryStream source and memory
  * sink — real micro-batch execution, watermarks and state included. */
class EventStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed counts aggregate by tumbling event-time window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .selectExpr("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionization closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then one 30 min later
      // (closes the first). A later event advances the watermark far enough
      // to time the second session out.
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(35), 1, "click", 4.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(300), 2, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(600), 2, "view", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(0).sum_value == 3.0)
      assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(5))
      assert(sessions(1).n_events == 1 && sessions(1).sum_value == 4.0)
    } finally q.stop()
  }
}
