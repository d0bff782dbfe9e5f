package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over event streams — the streaming twins of
  * the batch operators in [[graft.operators.EventOps]] (SURVEY §2.D row D6:
  * the reference is batch-only; event-time processing is the north-star
  * extension).
  *
  * Design for scale: state is keyed by user_id, so it shards across
  * executors; watermarks bound state size (late events beyond the watermark
  * are dropped); windowed aggregates use the built-in `window()` which
  * pre-aggregates map-side per trigger.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  final case class SessionState(start: Long, last: Long,
      n: Long, total: Double)

  /** Tumbling event-time window aggregate with a watermark — the streaming
    * form of EventOps.q20. */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding-window rates: 1-hour windows every 15 minutes. */
  def slidingRates(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))

  /** Streaming exact dedup on event_id — the streaming form of the exact
    * dedup / first-wins operators (dd01, q17). State holds one key per
    * event_id seen, and the watermark BOUNDS that state: an id older than
    * the watermark is evicted, so memory is O(ids per watermark window),
    * not O(stream length) — the property that keeps this runnable forever
    * on an unbounded stream. */
  def dedupedEvents(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join — click attribution: each
    * click joins the same user's views from the 10 minutes before it
    * (streaming twin of EventOps.q30). The time bound is what makes an
    * unbounded join feasible: with both sides watermarked and the join
    * condition range-bounded, Spark derives how long each side's state
    * must be retained and evicts the rest. */
  def attributedClicks(clicks: DataFrame, views: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val v = views.withWatermark("ts", watermark).alias("v")
    c.join(v, expr(
      """c.user_id = v.user_id AND
        |v.ts <= c.ts AND v.ts >= c.ts - interval 10 minutes""".stripMargin))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("v.event_id").as("view_id"),
        col("v.ts").as("view_ts"))
  }

  /** Gap-based sessionization via flatMapGroupsWithState — the streaming
    * form of EventOps.q22 (1800 s inactivity gap). Emits a Session row each
    * time a session closes: either a newer event arrives past the gap, or
    * the event-time timeout fires after the watermark passes. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      def close(s: SessionState): Unit =
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.last),
          s.n, s.total)
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        var cur = state.getOption
        for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapSeconds * 1000 =>
              cur = Some(SessionState(s.start, math.max(s.last, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              close(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
