package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventStream.{Event, Session}

/** The STATEFUL streaming scenarios (keyed state / state stores involved),
  * shared between the default HDFS-backed state store suite and the
  * RocksDB suite — a long-running production stream runs RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`), so the state logic
  * must be verified under both providers. Each query's provider is fixed
  * at start from the session conf; the conf is set around each scenario
  * and restored after.
  */
trait StatefulStreamingScenarios { this: SparkSpec =>

  /** None = Spark's default (HDFS-backed) provider. */
  def stateStoreProvider: Option[String]

  private def withProvider[T](f: => T): T = stateStoreProvider match {
    case None => f
    case Some(cls) =>
      val key = "spark.sql.streaming.stateStore.providerClass"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, cls)
      try f finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
  }

  protected def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming dedup drops repeated event_ids across micro-batches") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Event]
      val q = EventStream.dedupedEvents(input.toDF())
        .writeStream.format("memory").queryName("dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          Event(1, ts(0), 1, "click", 1.0),
          Event(1, ts(0), 1, "click", 1.0), // same-batch duplicate
          Event(2, ts(1), 1, "click", 2.0))
        q.processAllAvailable()
        input.addData(Event(1, ts(2), 1, "click", 1.0)) // cross-batch duplicate
        q.processAllAvailable()
        val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
        assert(ids.sorted.toSeq == Seq(1L, 2L), ids.mkString(","))
      } finally { q.stop(); spark.catalog.dropTempView("dedup") }
    }
  }

  test("streaming as-of attaches clicks to the latest prior view with O(users) state") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Event]
      val q = EventStream.asofAttach(input.toDS())
        .writeStream.format("memory").queryName("asof")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          Event(10, ts(0), 1, "view", 0.0),
          Event(11, ts(0), 1, "view", 0.0),  // same ts: max id wins
          Event(20, ts(0), 1, "click", 1.0), // same-second view is eligible
          Event(30, ts(2), 2, "click", 1.0)) // user 2 has no view yet
        q.processAllAvailable()
        input.addData(
          Event(21, ts(60), 1, "click", 1.0)) // still attaches to ts(0) view
        q.processAllAvailable()
        input.addData(
          Event(22, ts(-60), 1, "click", 1.0)) // LATE click, older than the
        q.processAllAvailable()                // stored view: null, never a
        val rows = spark.table("asof")         // future view (as-of guard)
          .selectExpr("click_id", "view_id").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
        assert(rows == Set((20L, 11L), (30L, -1L), (21L, 11L), (22L, -1L)),
          rows.mkString(","))
      } finally { q.stop(); spark.catalog.dropTempView("asof") }
    }
  }

  test("nearest-event attach waits out the horizon, then picks either direction (backward ties)") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Event]
      val q = EventStream.nearestAttach(input.toDS(),
          horizonSeconds = 120, watermark = "0 seconds")
        .writeStream.format("memory").queryName("nearest")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          // u1: views 60 s either side of the click — backward tie → id 1
          Event(1, ts(1), 1, "view", 0), Event(2, ts(2), 1, "click", 0),
          Event(3, ts(3), 1, "view", 0),
          // u2: only a FUTURE view inside the horizon → forward pick (id 5),
          // the case asofAttach structurally cannot produce
          Event(4, ts(10), 2, "click", 0), Event(5, ts(11), 2, "view", 0),
          // u3: nearest view is 5 min away — outside the 2 min horizon
          Event(6, ts(20), 3, "click", 0), Event(7, ts(25), 3, "view", 0))
        q.processAllAvailable()
        // (the no-data micro-batch after the watermark jump to ts(25) may
        // already fire every deadline; the sentinels below make it certain)
        input.addData(Event(98, ts(300), 9, "view", 0))
        q.processAllAvailable()
        input.addData(Event(99, ts(400), 9, "view", 0))
        q.processAllAvailable()
        val got = spark.table("nearest").as[EventStream.NearestAttached]
          .collect().map(r => r.click_id -> r.view_id).toMap
        assert(got == Map(2L -> Some(1L), 4L -> Some(5L), 6L -> None),
          got.toString)
      } finally { q.stop(); spark.catalog.dropTempView("nearest") }
    }
  }

  test("sessionization closes a session when the gap is exceeded") {
    withProvider {
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
      } finally { q.stop(); spark.catalog.dropTempView("sess") }
    }
  }

  test("windowed top-k emits each window exactly once at watermark close, matching the batch rank") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Event]
      val q = EventStream.topUsersPerWindow(input.toDS(), k = 3,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("topk")
        .outputMode(OutputMode.Append()).start()
      try {
        // hour 10: user1 ×3, user2 ×2, user3 ×1, user4 ×1 (tie → lower id)
        input.addData(
          Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 1.0),
          Event(3, ts(2), 1, "click", 1.0), Event(4, ts(3), 2, "click", 1.0),
          Event(5, ts(4), 2, "click", 1.0), Event(6, ts(5), 3, "click", 1.0),
          Event(7, ts(6), 4, "click", 1.0))
        q.processAllAvailable()
        // hour 11 opens; its arrival moves the watermark past hour 10's end
        input.addData(
          Event(8, ts(60), 5, "click", 1.0), Event(9, ts(61), 5, "click", 1.0),
          Event(10, ts(62), 1, "click", 1.0))
        q.processAllAvailable()
        // advance far enough to close hour 11 too (timeouts fire next batch)
        input.addData(Event(99, ts(240), 9, "click", 1.0))
        q.processAllAvailable()
        input.addData(Event(100, ts(300), 9, "click", 1.0))
        q.processAllAvailable()
        val got = spark.table("topk").as[EventStream.WindowTopK].collect()
          .map(r => (r.hour_epoch, r.rnk) -> (r.user_id, r.n)).toMap
        val h10 = ts(0).getTime / 3600000L * 3600L
        val h11 = ts(60).getTime / 3600000L * 3600L
        // the batch-twin ranking (count DESC, user_id ASC), hand-derived
        assert(got((h10, 1)) == (1L, 3L) && got((h10, 2)) == (2L, 2L) &&
          got((h10, 3)) == (3L, 1L), got.toString)
        assert(got((h11, 1)) == (5L, 2L) && got((h11, 2)) == (1L, 1L), got.toString)
        // exactly once per closed window, and the open tail window not yet
        assert(got.size == 5, got.toString)
      } finally { q.stop(); spark.catalog.dropTempView("topk") }
    }
  }

  test("incremental dedup stream flags new-vs-corpus dups per micro-batch") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "a b c a b c"),
        (3L, "old corpus text that nothing in the new batch resembles")
      ).toDF("doc_id", "text")
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Boolean, Boolean)]]
      val q = EventStream.incrementalDedupStream(
          input.toDF().toDF("doc_id", "text"), corpus) { (flags, batchId) =>
        got.synchronized {
          got(batchId) = flags.collect()
            .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
        }
      }
      try {
        input.addData(
          (8L, "the quick brown fox jumps over the lazy dog today"), // = doc 1
          (28L, "a genuinely fresh document with entirely new content here"))
        q.processAllAvailable()
        // same distinct shingle set as doc 2 (text differs): near, not exact
        input.addData((9L, "a b c a b c a b c"))
        q.processAllAvailable()
        val flagged = got.synchronized(got.toMap)
        assert(flagged.values.toSet ==
          Set(Set((8L, true, true)), Set((9L, false, true))), flagged.toString)
      } finally q.stop()
    }
  }
  test("windowed counts aggregate by tumbling event-time window") {
    withProvider {
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
    } finally { q.stop(); spark.catalog.dropTempView("wc") }
  }
  }

  test("native session_window merges within gap, splits across it, closes at watermark") {
    withProvider {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStream.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sw")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at minutes 0 and 10 (one session, gap < 30); next
      // at minute 50 (40-min gap → NEW session). user 2: single event.
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(50), 1, "click", 4.0),
        Event(4, ts(5), 2, "view", 8.0))
      // advance the watermark far enough to close every session
      input.addData(Event(99, ts(300), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sw")
        .selectExpr("user_id", "n", "sum_value",
          "CAST(session_end AS LONG) - CAST(session_start AS LONG)")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      // session length = span + gap extension (30 min past the last event)
      assert(rows.contains((1L, 2L, 3.0, 600L + 1800L)), rows.toString)
      assert(rows.contains((1L, 1L, 4.0, 1800L)), rows.toString)
      assert(rows.contains((2L, 1L, 8.0, 1800L)), rows.toString)
    } finally { q.stop(); spark.catalog.dropTempView("sw") }
  }
  }

  test("stream-stream interval join attributes clicks to prior views") {
    withProvider {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.attributedClicks(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(Event(10, ts(0), 1, "view", 0.0))
      clicks.addData(
        Event(20, ts(5), 1, "click", 1.0),  // 5 min after user 1's view: joins
        Event(21, ts(30), 1, "click", 1.0), // 30 min after: outside the bound
        Event(22, ts(6), 2, "click", 1.0))  // other user: no view at all
      q.processAllAvailable()
      val rows = spark.table("attr").select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((20L, 10L)), rows.mkString(","))
    } finally { q.stop(); spark.catalog.dropTempView("attr") }
  }
  }

  test("running distinct count stays in lockstep with its batch twin (q53)") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // user 1 revisits old types (count must NOT grow) and adds a new
      // one across the batch boundary; user 2 is single-type throughout.
      val evs = Seq(
        (10L, 0, 1L, "view"), (11L, 1, 1L, "click"), (12L, 2, 1L, "view"),
        (20L, 0, 2L, "view"), (21L, 3, 2L, "view"))
      val late = Seq(
        (13L, 4, 1L, "purchase"), (14L, 5, 1L, "click"),
        (22L, 6, 2L, "view"))
      val tmp = java.nio.file.Files.createTempDirectory("q53-lockstep").toFile
      try {
        (evs ++ late).map { case (id, m, u, k) => (id, ts(m).getTime * 1000000L, u, k) }
          .toDF("event_id", "ts", "user_id", "event_type")
          .write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val batch = graft.operators.EventOps.q53RunningDistinct(spark, tmp.getPath)
          .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
        val input = MemoryStream[Event]
        val q = EventStream.runningDistinct(input.toDS())
          .writeStream.format("memory").queryName("q53_lockstep")
          .outputMode(OutputMode.Append()).start()
        try {
          input.addData(evs.map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          input.addData(late.map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          val stream = spark.table("q53_lockstep")
            .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
          assert(batch == Map(10L -> 1L, 11L -> 2L, 12L -> 2L, 13L -> 3L,
            14L -> 3L, 20L -> 1L, 21L -> 1L, 22L -> 1L), batch.toString)
          assert(stream == batch, s"batch=$batch stream=$stream")
        } finally { q.stop(); spark.catalog.dropTempView("q53_lockstep") }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("streaming path miner stays in lockstep with its batch twin (q62)") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // user 1's third trigram completes only after the batch boundary —
      // the last-two-types state must carry; user 2 is a repeating loop.
      val evs = Seq(
        (10L, 0, 1L, "view"), (11L, 1, 1L, "click"), (12L, 2, 1L, "view"),
        (20L, 0, 2L, "view"), (21L, 1, 2L, "view"), (22L, 2, 2L, "view"))
      val late = Seq(
        (13L, 3, 1L, "purchase"), (14L, 4, 1L, "click"),
        (23L, 3, 2L, "view"))
      val tmp = java.nio.file.Files.createTempDirectory("q62-lockstep").toFile
      try {
        (evs ++ late).map { case (id, m, u, k) => (id, ts(m).getTime * 1000000L, u, k) }
          .toDF("event_id", "ts", "user_id", "event_type")
          .write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val batch = graft.operators.EventOps.q62EventPaths(spark, tmp.getPath)
          .collect()
          .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
            r.getLong(3))).toMap
        val input = MemoryStream[Event]
        val q = EventStream.pathMine(input.toDS())
          .writeStream.format("memory").queryName("q62_lockstep")
          .outputMode(OutputMode.Append()).start()
        try {
          input.addData(evs.map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          input.addData(late.map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          val stream = spark.table("q62_lockstep").collect()
            .map(r => (r.getString(1), r.getString(2), r.getString(3)))
            .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
          assert(batch == Map(
            ("view", "click", "view") -> 1L, ("click", "view", "purchase") -> 1L,
            ("view", "purchase", "click") -> 1L, ("view", "view", "view") -> 2L),
            batch.toString)
          assert(stream == batch, s"batch=$batch stream=$stream")
        } finally { q.stop(); spark.catalog.dropTempView("q62_lockstep") }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("CDC z-set aggregation retracts deletes, matching the surviving-rows recompute") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import EventStream.CdcChange
      val input = MemoryStream[CdcChange]
      val q = EventStream.cdcAggregateStream(input.toDF())
        .writeStream.format("memory").queryName("cdc_zset")
        .outputMode(OutputMode.Complete()).start()
      try {
        // batch 1: inserts only
        input.addData(CdcChange("en", 1, 100), CdcChange("en", 1, 50),
          CdcChange("de", 1, 30), CdcChange("fr", 1, 70))
        q.processAllAvailable()
        // batch 2: retract one en doc and ALL of fr; insert another de
        input.addData(CdcChange("en", -1, 50), CdcChange("fr", -1, 70),
          CdcChange("de", 1, 40))
        q.processAllAvailable()
        val got = spark.table("cdc_zset")
          .filter($"n_docs" > 0).collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
        // survivors: en {100}, de {30, 40}; fr fully retracted
        assert(got == Map("en" -> (1L, 100L), "de" -> (2L, 70L)), got.toString)
      } finally { q.stop(); spark.catalog.dropTempView("cdc_zset") }
    }
  }

  test("stream-stream interval join stays in lockstep with its batch twin (q37)") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // (event_id, minute, user_id, kind) — covers in-window, boundary-out
      // (11 min), multi-view fan-out, and cross-user isolation
      val evs = Seq(
        (10L, 0, 1L, "view"), (11L, 4, 1L, "view"), (20L, 5, 1L, "click"),
        (12L, 28, 1L, "view"), (21L, 30, 1L, "click"),
        (13L, 2, 2L, "view"), (30L, 6, 2L, "click"), (31L, 13, 2L, "click"))
      val tmp = java.nio.file.Files.createTempDirectory("q37-lockstep").toFile
      try {
        evs.map { case (id, m, u, k) => (id, ts(m).getTime * 1000000L, u, k) }
          .toDF("event_id", "ts", "user_id", "event_type")
          .write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val batch = graft.operators.EventOps.q37IntervalJoin(spark, tmp.getPath)
          .select("click_id", "view_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val clicks = MemoryStream[Event]
        val views = MemoryStream[Event]
        val q = EventStream.attributedClicks(clicks.toDF(), views.toDF())
          .writeStream.format("memory").queryName("q37_lockstep")
          .outputMode(OutputMode.Append()).start()
        try {
          views.addData(evs.filter(_._4 == "view")
            .map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          clicks.addData(evs.filter(_._4 == "click")
            .map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          val stream = spark.table("q37_lockstep").select("click_id", "view_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(batch == Set((20L, 10L), (20L, 11L), (21L, 12L), (30L, 13L)), batch)
          assert(stream == batch, s"batch=$batch stream=$stream")
        } finally { q.stop(); spark.catalog.dropTempView("q37_lockstep") }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }
  }

  test("streaming funnel emits per-user stage times at idle timeout, matching q40") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // user 1: full funnel in order; user 2: purchase BEFORE any click —
      // must not count; user 3: click before its only view — no click
      // stage; user 4: clicks only, no view — no row at all.
      val evs = Seq(
        (1L, 0, 1L, "view"), (2L, 5, 1L, "click"), (3L, 9, 1L, "purchase"),
        (4L, 1, 2L, "view"), (5L, 2, 2L, "purchase"), (6L, 6, 2L, "click"),
        (7L, 3, 3L, "click"), (8L, 7, 3L, "view"),
        (9L, 4, 4L, "click"))
      val tmp = java.nio.file.Files.createTempDirectory("q40-lockstep").toFile
      try {
        evs.map { case (id, m, u, k) => (id, ts(m).getTime * 1000000L, u, k) }
          .toDF("event_id", "ts", "user_id", "event_type")
          .write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val batch = graft.operators.EventOps.q40Funnel(spark, tmp.getPath)
          .collect().map(r => r.getLong(0) ->
            (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
        val input = MemoryStream[Event]
        val q = EventStream.funnelProgress(input.toDS(),
            idleGapSeconds = 600, watermark = "0 seconds")
          .writeStream.format("memory").queryName("funnel")
          .outputMode(OutputMode.Append()).start()
        try {
          input.addData(evs.map { case (id, m, u, k) => Event(id, ts(m), u, k, 0.0) })
          q.processAllAvailable()
          // advance the watermark far past every user's idle deadline;
          // timeouts fire on the NEXT batch after the watermark moves
          input.addData(Event(99, ts(120), 9, "error", 0.0))
          q.processAllAvailable()
          input.addData(Event(100, ts(180), 9, "error", 0.0))
          q.processAllAvailable()
          val stream = spark.table("funnel").as[EventStream.FunnelRow].collect()
            .map(r => r.user_id -> (r.t_view, r.t_click, r.t_purchase)).toMap
          val batchN = batch.map { case (u, (v, c, p)) =>
            u -> (v.map(_.asInstanceOf[Long]), c.map(_.asInstanceOf[Long]),
              p.map(_.asInstanceOf[Long]))
          }
          assert(batchN.keySet == Set(1L, 2L, 3L), batchN.toString)
          assert(stream == batchN, s"batch=$batchN stream=$stream")
          // hand-derived: u1 full funnel; u2 reaches click@6 but its
          // purchase@2 PRECEDED the click, so the purchase stage stays
          // empty; u3's click preceded its first view — view only
          assert(stream(1L)._3.isDefined, stream.toString)
          assert(stream(2L)._2.isDefined && stream(2L)._3.isEmpty, stream.toString)
          assert(stream(3L)._2.isEmpty && stream(3L)._3.isEmpty, stream.toString)
        } finally { q.stop(); spark.catalog.dropTempView("funnel") }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("streaming lerp resampler stays in lockstep with its batch twin (q64)") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // (event_id, minute, user, value); round boundaries exercise state
      // carry and the same-second boundary-tick CORRECTION (upsert law)
      val rounds: Seq[Seq[(Long, Int, Long, Double)]] = Seq(
        Seq((1L, 0, 1L, 1.0), (10L, 30, 2L, 4.0)),
        // u1 #2 repeats second 10:00:00 with a new value — the emitted
        // boundary tick must be corrected; u2 closes its 11:00 tick
        Seq((2L, 0, 1L, 2.5), (11L, 75, 2L, 8.0)),
        Seq((3L, 90, 1L, 5.0), (4L, 120, 1L, 3.0)),
        // 12:30 closes NO tick (next boundary 13:00 not reached);
        // 13:01 then lerps the 13:00 tick across the 12:30 event
        Seq((5L, 150, 1L, 7.0), (6L, 181, 1L, 1.0)))
      val tmp = java.nio.file.Files.createTempDirectory("q64-lockstep").toFile
      try {
        rounds.flatten
          .map { case (id, m, u, v) => (id, ts(m).getTime * 1000000L, u, "view", v) }
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .write.mode("overwrite").parquet(s"$tmp/events.parquet")
        val batch = graft.operators.EventOps.q64InterpResample(spark, tmp.getPath)
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
        val input = MemoryStream[Event]
        val q = EventStream.interpResample(input.toDS())
          .writeStream.format("memory").queryName("q64_lockstep")
          .outputMode(OutputMode.Append()).start()
        try {
          // replay round by round, folding upserts: per micro-batch each
          // (user, g) is emitted at most once, so last-batch-wins per key
          var last = Map.empty[(Long, Long), (Long, Long)]
          var seen = 0
          rounds.foreach { r =>
            input.addData(r.map { case (id, m, u, v) => Event(id, ts(m), u, "view", v) })
            q.processAllAvailable()
            val all = spark.table("q64_lockstep").collect()
              .map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3))))
            last = last ++ all.drop(seen).toMap
            seen = all.length
          }
          assert(last == batch, s"batch=$batch stream=$last")
          // hand-derived: the corrected 10:00 boundary tick serves the
          // LAST same-second value (2500 milli-units), and the 13:00 tick
          // lerps 12:30(7000) → 13:01(1000) over the 1860 s span
          val h10 = ts(0).getTime / 1000
          assert(batch((1L, h10)) == ((2500L, 1L)), batch.toString)
          assert(batch((1L, h10 + 3 * 3600)) ==
            ((7000L * 60 + 1000L * 1800, 1860L)), batch.toString)
          // a LATE cross-batch event must be a NO-OP: state would regress
          // and corrupt re-emitted ticks otherwise
          val before = spark.table("q64_lockstep").count()
          input.addData(Seq(Event(99L, ts(5), 1L, "view", 9.9)))
          q.processAllAvailable()
          assert(spark.table("q64_lockstep").count() === before)
          // SAME-SECOND cross-batch ties break by event_id (eid carried
          // in state since round 6), matching the batch twin's
          // highest-id-wins rule: a fresh user emits its boundary tick,
          // a later batch's same-second LOWER id is a no-op, and a later
          // batch's same-second HIGHER id re-emits the corrected tick.
          input.addData(Seq(Event(50L, ts(60), 3L, "view", 1.0)))
          q.processAllAvailable()
          val h11 = ts(60).getTime / 1000
          def lastTick(u: Long, g: Long): (Long, Long) =
            spark.table("q64_lockstep").collect()
              .filter(x => x.getLong(0) == u && x.getLong(1) == g)
              .map(x => (x.getLong(2), x.getLong(3))).last
          assert(lastTick(3L, h11) == ((1000L, 1L)))
          val afterNew = spark.table("q64_lockstep").count()
          input.addData(Seq(Event(49L, ts(60), 3L, "view", 9.0)))
          q.processAllAvailable()
          assert(spark.table("q64_lockstep").count() === afterNew)
          assert(lastTick(3L, h11) == ((1000L, 1L)))
          input.addData(Seq(Event(51L, ts(60), 3L, "view", 2.0)))
          q.processAllAvailable()
          assert(lastTick(3L, h11) == ((2000L, 1L)))
        } finally { q.stop(); spark.catalog.dropTempView("q64_lockstep") }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("unattended index lifecycle: the ingest stream folds past fold-due and " +
      "rotates past compact-due while the serve stream answers throughout, " +
      "and the post-rotate serve equals the batch verb") {
    withProvider {
      import graft.operators.Similarity
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val sfDir = "/root/testdata/sf0.001"
      val emb = graft.Tables(spark, sfDir, "embeddings")
      val vecs = graft.operators.Dedup.quantized(emb)
        .select(col("vec_id"), col("v"), col("nrm")).localCheckpoint()
      val standing = vecs.filter(col("vec_id") % 10 =!= 3)
      val incRaw = emb.filter(col("vec_id") % 10 === 3)
        .select(col("vec_id"), col("label"), col("embedding"))
        .as[(Long, String, Array[Float])].collect()
      val extRaw = emb.filter(col("vec_id") % 100 === 50)
        .select((col("vec_id") + lit(10000000L)).as("q_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val root = java.nio.file.Files.createTempDirectory("nsw-lifecycle").toString
      val idx = s"$root/idx"; val dst = s"$root/gen2"; val out = s"$root/served"
      // dials: every micro-batch is past the fold threshold, and the %9
      // tombstones (~11%) are past the compact threshold
      spark.conf.set("spark.graft.nsw.foldAppendPct", "1")
      spark.conf.set("spark.graft.nsw.compactTombstonePct", "10")
      try {
        Similarity.buildNswIndex(spark, standing, idx)
        val ingestIn = MemoryStream[(Long, String, Array[Float])]
        val serveIn = MemoryStream[(Long, Array[Float])]
        val ingest = EventStream.graphIngestStream(
          ingestIn.toDF().toDF("vec_id", "label", "embedding"), idx,
          autoMaintain = true, rotateTo = Some(dst))
        val serve = EventStream.beamServeStream(
          serveIn.toDF().toDF("q_id", "embedding"), idx, out)
        def feedServe(chunk: Array[(Long, Array[Float])]): Unit = {
          serveIn.addData(chunk.toSeq); serve.processAllAvailable()
        }
        def feedIngest(chunk: Array[(Long, String, Array[Float])]): Unit = {
          ingestIn.addData(chunk.toSeq); ingest.processAllAvailable()
        }
        val chunks = incRaw.grouped(incRaw.length / 3 + 1).toArray
        val (sa, sb) = extRaw.splitAt(extRaw.length / 2)
        // phase 1: serve, ingest→fold, serve again
        feedServe(sa)
        feedIngest(chunks(0))
        assert(!new java.io.File(s"$idx/edges_delta").exists(),
          "past-fold-due micro-batch must leave no delta behind")
        assert(new java.io.File(s"$idx/_append_tags").listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".")).map(_.getName)
          .forall(_.startsWith("_spent_")),
          "the fold must compact the batch-identity sidecar")
        feedServe(sb)
        // phase 2: deletes arrive via the batch verb; the next micro-batch's
        // maintenance sees compact_due and rotates ONCE into dst
        Similarity.tombstoneNswIndex(spark, idx,
          vecs.filter(col("vec_id") % 9 === 0).select(col("vec_id")))
        feedIngest(chunks(1))
        val dstManifest = new java.io.File(s"$dst/manifest.json")
        assert(dstManifest.isFile, "compact_due must rotate into dst")
        assert(!new java.io.File(s"$dst/tombstones").exists() &&
          !new java.io.File(s"$dst/edges_delta").exists(),
          "the rotated artifact starts with a clean verb ladder")
        assert(spark.read.parquet(s"$dst/ivf/lists")
          .filter(col("vec_id") % 9 === 0).count() == 0,
          "the rotated artifact must hold alive vectors only")
        val stamp = dstManifest.lastModified()
        // phase 3: the source keeps ingesting and serving; the finished
        // destination is NOT re-rotated while compact_due persists
        feedIngest(chunks(2))
        assert(dstManifest.lastModified() == stamp,
          "a finished rotation must not be re-executed per micro-batch")
        feedServe(sa.take(3))
        ingest.stop(); serve.stop()
        // phase 4: the operator switch — a fresh serve stream on dst
        // answers in lockstep with the batch verb over the same artifact
        val out2 = s"$root/served2"
        val serveIn2 = MemoryStream[(Long, Array[Float])]
        val serve2 = EventStream.beamServeStream(
          serveIn2.toDF().toDF("q_id", "embedding"), dst, out2)
        serveIn2.addData(sb.toSeq); serve2.processAllAvailable()
        serve2.stop()
        val streamed = spark.read.parquet(out2)
          .select(col("q_id"), col("c_id"), col("rnk"), col("cos"))
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toList.sorted
        val batchQs = emb
          .filter((col("vec_id") + 10000000L).isin(sb.map(_._1).toSeq: _*))
          .select((col("vec_id") + lit(10000000L)).as("q_id"),
            expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
              .as("v1"))
          .withColumn("n1", expr("dot_l(v1, v1)"))
        val oneShot = Similarity.beamServeExternal(spark, dst, batchQs)
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toList.sorted
        assert(streamed == oneShot,
          "the post-rotate streamed serve must equal the batch serve")
      } finally {
        spark.conf.unset("spark.graft.nsw.foldAppendPct")
        spark.conf.unset("spark.graft.nsw.compactTombstonePct")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    }
  }

  test("dedup ingest stream lifecycle: check → roll-forward → auto-compact, with later batches deduping against earlier accepted docs") {
    withProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import graft.operators.DedupStore
      val root = java.nio.file.Files.createTempDirectory("dedup-ingest").toString
      val storeDir = s"$root/store"
      val outDir = s"$root/flags"
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "a b c a b c"),
        (3L, "old corpus text that nothing in the new batch resembles"))
        .toDF("doc_id", "text")
      val freshDoc = "a genuinely fresh document with entirely new content here"
      val lateDoc = "a later arrival document with its own words and nothing shared"
      DedupStore.build(corpus, storeDir)
      // keep the default dial (5%): every accepted batch here exceeds it,
      // so autoMaintain compacts after each roll-forward — the unattended
      // loop's steady state
      val input = MemoryStream[(Long, String)]
      val q = EventStream.dedupIngestStream(
        input.toDF().toDF("doc_id", "text"), storeDir, outDir,
        Some(s"$root/ck"), autoMaintain = true)
      try {
        // batch 0: 8 = exact copy of corpus doc 1 (flagged), 28 fresh
        input.addData((8L, corpus.collect()(0).getString(1)), (28L, freshDoc))
        q.processAllAvailable()
        // batch 1: 38 = exact copy of batch-0's ACCEPTED doc 28 — findable
        // ONLY if the stream rolled 28 forward; 48 is new
        input.addData((38L, freshDoc), (48L, lateDoc))
        q.processAllAvailable()
        val flags = spark.read.parquet(outDir)
          .select("batch", "doc_id", "dup_exact", "dup_near").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
          .toSet
        assert(flags == Set((0, 8L, true, true), (1, 38L, true, true)),
          s"batch 1 must flag 38 against batch 0's accepted roll-forward: $flags")
        // lockstep with the batch verbs: the streamed store answers exactly
        // like a fresh build over corpus ∪ accepted(0) ∪ accepted(1)
        val probe = Seq((58L, lateDoc)).toDF("doc_id", "text")
        val viaStream = DedupStore.incrementalAgainstStore(
          probe, DedupStore.read(spark, storeDir))
          .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
        DedupStore.build(
          corpus.unionAll(Seq((28L, freshDoc), (48L, lateDoc)).toDF("doc_id", "text")),
          s"$root/fresh")
        val viaFresh = DedupStore.incrementalAgainstStore(
          probe, DedupStore.read(spark, s"$root/fresh"))
          .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
        assert(viaStream == viaFresh && viaStream == Set((58L, true, true)),
          s"stream=$viaStream fresh=$viaFresh")
        // autoMaintain ran: appends are folded (no loose fingerprints), the
        // hash table is duplicate-free, and the plan reads all-quiet
        val plan = DedupStore.dedupMaintenancePlan(spark, storeDir).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(plan("appended_set_rows") == 0 &&
          plan("rollforwards") == 0 && plan("compact_due") == 0, plan.toString)
        val hashes = spark.read.parquet(s"$storeDir/hashes")
        assert(hashes.count() == hashes.distinct().count())
      } finally {
        q.stop()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    }
  }
}

/** Drives the streaming operators through a MemoryStream source and memory
  * sink — real micro-batch execution, watermarks and state included —
  * under the DEFAULT (HDFS-backed) state store provider. */
class EventStreamSpec extends SparkSpec with StatefulStreamingScenarios {

  override def stateStoreProvider: Option[String] = None




  test("store-backed incremental dedup stream matches the staged-corpus form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a b c a b c"),
      (3L, "old corpus text that nothing in the new batch resembles")
    ).toDF("doc_id", "text")
    val storeDir = java.nio.file.Files.createTempDirectory("stream-store").toFile
    try {
      graft.operators.DedupStore.build(corpus, storeDir.getPath)
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Boolean, Boolean)]]
      val q = EventStream.incrementalDedupStreamFromStore(
          input.toDF().toDF("doc_id", "text"), storeDir.getPath) { (flags, batchId) =>
        got.synchronized {
          got(batchId) = flags.collect()
            .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
        }
      }
      try {
        input.addData(
          (8L, "the quick brown fox jumps over the lazy dog today"), // = doc 1
          (28L, "a genuinely fresh document with entirely new content here"))
        q.processAllAvailable()
        input.addData((9L, "a b c a b c a b c")) // near twin of doc 2
        q.processAllAvailable()
        val flagged = got.synchronized(got.toMap)
        assert(flagged.values.toSet ==
          Set(Set((8L, true, true)), Set((9L, false, true))), flagged.toString)
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(storeDir)
  }

  test("ivf serve stream: micro-batched external queries equal the batch serve " +
      "at the measured rung, and a replayed batch converges to one copy") {
    import graft.operators.Similarity
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val base = graft.operators.Dedup.quantized(emb)
      .select(col("vec_id"), col("v"), col("nrm")).localCheckpoint()
    val extRaw = emb.filter(col("vec_id") % 100 === 50)
      .select((col("vec_id") + lit(10000000L)).as("q_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val root = java.nio.file.Files.createTempDirectory("ivf-serve-stream").toString
    val idx = s"$root/idx"; val out = s"$root/served"
    try {
      Similarity.buildIvfIndex(base, idx) // manifest records the measured rung
      val input = MemoryStream[(Long, Array[Float])]
      val q = EventStream.ivfServeStream(
        input.toDF().toDF("q_id", "embedding"), idx, out)
      val (sa, sb) = extRaw.splitAt(extRaw.length / 2)
      try {
        input.addData(sa.toSeq); q.processAllAvailable()
        input.addData(sb.toSeq); q.processAllAvailable()
      } finally q.stop()
      def served(): List[(Long, Long, Int, Double)] =
        spark.read.parquet(out)
          .select(col("q_id"), col("c_id"), col("rnk"), col("cos"))
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toList.sorted
      val streamed = served()
      val batchQs = emb
        .filter((col("vec_id") + 10000000L).isin(extRaw.map(_._1).toSeq: _*))
        .select((col("vec_id") + lit(10000000L)).as("q_id"),
          expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
            .as("v1"))
        .withColumn("n1", expr("dot_l(v1, v1)"))
      val oneShot = Similarity.ivfServeExternal(spark, idx, batchQs)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toList.sorted
      assert(streamed == oneShot,
        "the streamed micro-batches must equal the one-shot batch serve")
      // at-least-once redelivery: replaying batch 0 with its marker in
      // place is a no-op; replaying after LOSING the marker (crash between
      // write and marker) overwrites to the same rows
      val b0 = input.toDF().sparkSession.createDataFrame(sa.toSeq)
        .toDF("q_id", "embedding")
      EventStream.serveIvfBatch(b0, idx, out, 0L)
      assert(served() == streamed, "a marker-gated replay must be a no-op")
      new java.io.File(s"$out/_serve_commits/0").delete()
      EventStream.serveIvfBatch(b0, idx, out, 0L)
      assert(served() == streamed,
        "a replay after a pre-marker crash must converge to the same rows")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("commit-marker retention: markers past the window are pruned, and a " +
      "replay of a pruned batch re-serves to the same rows") {
    import graft.operators.Similarity
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val base = graft.operators.Dedup.quantized(emb)
      .select(col("vec_id"), col("v"), col("nrm")).localCheckpoint()
    val b0 = emb.filter(col("vec_id") % 100 === 50)
      .select((col("vec_id") + lit(10000000L)).as("q_id"), col("embedding"))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("marker-prune").toString
    val idx = s"$root/idx"; val out = s"$root/served"
    spark.conf.set("spark.graft.stream.commitRetention", "1")
    spark.conf.set("spark.graft.stream.commitPruneInterval", "2")
    try {
      Similarity.buildIvfIndex(base, idx)
      EventStream.serveIvfBatch(b0, idx, out, 0L)
      def rows(batch: Long) = spark.read.parquet(s"$out/batch=$batch")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toList.sorted
      val rows0 = rows(0L)
      def marker(id: Long) = new java.io.File(s"$out/_serve_commits/$id")
      assert(marker(0L).isFile)
      // the second batch hits the amortized prune boundary: only the
      // newest `commitRetention` markers survive — the marker dir stays
      // bounded on an unattended stream
      EventStream.serveIvfBatch(b0, idx, out, 256L)
      assert(!marker(0L).exists(), "markers past the retention window must go")
      assert(marker(256L).isFile)
      // the pruned batch replays without its marker: the deterministic
      // overwrite converges to the same rows (markers are optimizations,
      // not the correctness gate)
      EventStream.serveIvfBatch(b0, idx, out, 0L)
      assert(rows(0L) == rows0, "a pruned-marker replay must converge")
      assert(marker(0L).isFile, "the replay re-commits its marker")
    } finally {
      spark.conf.unset("spark.graft.stream.commitRetention")
      spark.conf.unset("spark.graft.stream.commitPruneInterval")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("commit-marker retention is reset-proof: a fresh-checkpoint incarnation " +
      "(batchId restarts at 0) still prunes its predecessor's markers") {
    val root = java.nio.file.Files.createTempDirectory("marker-reset").toString
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val md = new org.apache.hadoop.fs.Path(s"$root/_serve_commits")
    f.mkdirs(md)
    // the PREDECESSOR incarnation's markers: high batchIds, old mtimes —
    // an id-floor `batchId − keep` keyed on the NEW incarnation's batchId
    // (which restarted at 0) would never go positive, leaking these forever
    // (round-11 verdict #3)
    for (i <- 100 to 109) {
      val p = new org.apache.hadoop.fs.Path(md, i.toString)
      f.create(p, true).close()
      f.setTimes(p, 1000000000L + i, -1)
    }
    spark.conf.set("spark.graft.stream.commitRetention", "4")
    spark.conf.set("spark.graft.stream.commitPruneInterval", "1")
    try {
      for (b <- 0L to 2L) {
        f.create(new org.apache.hadoop.fs.Path(md, b.toString), false).close()
        EventStream.pruneCommitMarkers(spark, f, md, b)
      }
      val left = f.listStatus(md).filter(_.isFile)
        .map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
      // newest 4 by (mtime, id): the fresh incarnation's 0..2 plus the
      // newest predecessor marker — everything older is pruned
      assert(left == Set("0", "1", "2", "109"), left.toString)
    } finally {
      spark.conf.unset("spark.graft.stream.commitRetention")
      spark.conf.unset("spark.graft.stream.commitPruneInterval")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("erase-request stream: a request screens the very next check, and autoMaintain " +
      "runs the physical pass once the pending dial fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.DedupStore
    val root = java.nio.file.Files.createTempDirectory("erase-stream").toString
    val storeDir = s"$root/store"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a b c a b c"),
      (3L, "old corpus text that nothing in the new batch resembles"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (8L, "the quick brown fox jumps over the lazy dog today"), // = doc 1
      (9L, "a b c a b c a b c")) // near twin of doc 2
      .toDF("doc_id", "text")
    def flags() = DedupStore.incrementalAgainstStore(
        probe, DedupStore.read(spark, storeDir))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    DedupStore.build(corpus, storeDir)
    assert(flags() == Set((8L, true, true), (9L, false, true)))
    val input = MemoryStream[Long]
    val q = EventStream.eraseRequestStream(
      input.toDF().toDF("doc_id"), storeDir, Some(s"$root/ck"),
      autoMaintain = true)
    try {
      input.addData(1L)
      q.processAllAvailable()
      // default dial (1%): 1 pending over base 3 fires the physical pass
      assert(!new java.io.File(storeDir, "_erase_pending").exists(),
        "autoMaintain must run the physical pass and clear the ledger")
      assert(spark.read.parquet(s"$storeDir/hashes")
        .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
        .count() == 0, "the bytes must be gone")
      // 8's dup source is forgotten; 9 still near-dups the surviving doc 2
      assert(flags() == Set((9L, false, true)), flags().toString)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("ingest dedup flags WITHIN a micro-batch: same-batch exact twins follow " +
      "insert-conflict order (first lands, later flagged), near twins are flagged too") {
    import spark.implicits._
    import graft.operators.DedupStore
    val root = java.nio.file.Files.createTempDirectory("dedup-intra").toString
    val storeDir = s"$root/store"; val outDir = s"$root/flags"
    val corpus = Seq(
      (3L, "old corpus text that nothing in the new batch resembles"))
      .toDF("doc_id", "text")
    DedupStore.build(corpus, storeDir)
    try {
      // one micro-batch: 10/11 exact twins OF EACH OTHER (neither in the
      // store), 12 a near twin of them — before the intra pass all three
      // were admitted (round-12 advice)
      val batch = Seq(
        (10L, "a b c a b c"),
        (11L, "a b c a b c"),
        (12L, "a b c a b c a b c")).toDF("doc_id", "text").localCheckpoint()
      EventStream.ingestDedupBatch(batch, storeDir, outDir, 0L)
      val flags = spark.read.parquet(s"$outDir/batch=0")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
        .toSet
      assert(flags == Set((11L, true, true), (12L, false, true)),
        s"later same-batch rows must see earlier ones: $flags")
      // only the first twin was rolled forward
      val admitted = spark.read.parquet(s"$storeDir/hashes")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(3L, 10L), admitted.toString)
      // and the NEXT batch dedups against the admitted min — proving the
      // roll-forward carried exactly the insert-conflict survivor
      val batch1 = Seq((20L, "a b c a b c")).toDF("doc_id", "text")
        .localCheckpoint()
      EventStream.ingestDedupBatch(batch1, storeDir, outDir, 1L)
      val flags1 = spark.read.parquet(s"$outDir/batch=1")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
        .toSet
      assert(flags1 == Set((20L, true, true)), flags1.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("stream-static enrichment joins each batch against the broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "tier")
    val q = EventStream.enriched(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enr")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 3, "view", 2.0)) // no dim row: left join keeps it
      q.processAllAvailable()
      val rows = spark.table("enr").selectExpr("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, None)), rows.mkString(","))
    } finally q.stop()
  }
}

/** The same stateful scenarios under RocksDB — the provider every
  * long-running production stream uses (bounded JVM heap: state lives
  * off-heap/on-disk in RocksDB instead of the executor heap). */
class RocksDbEventStreamSpec extends SparkSpec with StatefulStreamingScenarios {
  override def stateStoreProvider: Option[String] = Some(
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
