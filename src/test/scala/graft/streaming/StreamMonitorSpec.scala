package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventStream.Event

/** StreamMonitor captures per-micro-batch metrics through the listener bus
  * and exposes the same numbers the log lines print. */
class StreamMonitorSpec extends SparkSpec {

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:${minute}%02d:00")

  test("monitor logs batches with rows, state size and watermark; snapshot queryable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lines = new ConcurrentLinkedQueue[String]()
    val mon = StreamMonitor.attach(spark, log = lines.add(_))
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("mon_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(30), 2, "click", 1.0))
      q.processAllAvailable()
      // listener events are delivered asynchronously after the batch
      val deadline = System.currentTimeMillis() + 20000
      var snap = mon.lastProgress(q.id)
      while (snap.forall(_.inputRows == 0) && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); snap = mon.lastProgress(q.id)
      }
      assert(snap.isDefined, lines.toString)
      // some observed batch carried the planted rows and a real watermark
      val logged = lines.toArray(Array.empty[String]).toSeq
      assert(logged.exists(_.contains("rows=2")), logged.mkString("\n"))
      assert(logged.exists(l => l.contains("wm=2026-01-01")), logged.mkString("\n"))
      // the windowed agg holds state -> state rows reported nonzero somewhere
      assert(logged.exists(_.matches(".*state=[1-9]\\d*.*")), logged.mkString("\n"))
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
      spark.catalog.dropTempView("mon_counts")
    }
  }
}
