package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental-view contract: (1) merge(state, partials(increment))
  * equals a full recompute over base ∪ increment for any split — the
  * monoid property mv01's oracle hash-check rests on; (2) the roll-forward
  * plan reads the state table and the increment ONLY — at 100 TB the base
  * corpus must never be rescanned, pinned here at the file level. */
class MatViewSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("lang").collect().map(_.toString).toSeq

  test("roll-forward equals full recompute, including increment-only groups") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    // force a group that exists ONLY in the increment: rewrite the lang of
    // the increment's rows so the union path must surface a new key
    val base = docs.filter(col("doc_id") % 10 =!= 3)
    val inc = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("lang",
        when(col("doc_id") % 20 === 3, lit("zz")).otherwise(col("lang")))
    val dir = Files.createTempDirectory("mv-spec").toFile
    try {
      MatView.buildState(base, s"${dir.getPath}/state")
      val merged = MatView.rollForward(spark, s"${dir.getPath}/state", inc)
      val full = MatView.partials(base.unionByName(inc))
      assert(canon(merged) === canon(full))
      assert(merged.filter(col("lang") === "zz").count() === 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("roll-forward scans state + increment files, never the base corpus") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("mv-scan").toFile
    try {
      // base and increment written to DISTINCT parquet dirs so the scan
      // set is checkable by path
      docs.filter(col("doc_id") % 10 =!= 3).write.parquet(s"${dir.getPath}/base")
      docs.filter(col("doc_id") % 10 === 3).write.parquet(s"${dir.getPath}/inc")
      val base = spark.read.parquet(s"${dir.getPath}/base")
      MatView.buildState(base, s"${dir.getPath}/state")
      val merged = MatView.rollForward(spark, s"${dir.getPath}/state",
        spark.read.parquet(s"${dir.getPath}/inc"))
      // logical-plan file set (AQE hides FileSourceScanExec pre-execution)
      val scanned = merged.inputFiles.toSeq
      assert(scanned.nonEmpty)
      assert(!scanned.exists(_.contains("/base/")),
        s"roll-forward must not read the base corpus: ${scanned.mkString(", ")}")
      assert(scanned.exists(_.contains("/state")) &&
        scanned.exists(_.contains("/inc/")), scanned.mkString(", "))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("histogram roll-forward: merged quantile state equals full recompute for any split") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("mv-hist").toFile
    try {
      // a deliberately different split from mv05's (% 3 vs % 10) — the
      // monoid law must hold for ANY partition of the stream
      val base = ev.filter(col("event_id") % 3 =!= 0)
      val inc = ev.filter(col("event_id") % 3 === 0)
      MatView.histPartials(base).write.parquet(s"${dir.getPath}/state")
      val merged = spark.read.parquet(s"${dir.getPath}/state")
        .unionByName(MatView.histPartials(inc))
        .groupBy(col("event_type"), col("v100"))
        .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("cnt"))
      val full = MatView.histPartials(ev)
      val c1 = merged.orderBy("event_type", "v100").collect().map(_.toString).toSeq
      val c2 = full.orderBy("event_type", "v100").collect().map(_.toString).toSeq
      assert(c1 === c2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("mv02 state partition-prunes by day and merge equals full recompute") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val day = expr("unix_timestamp(ts) div 86400")
    val lastDay = ev.agg(max(day)).head.getLong(0)
    val dir = Files.createTempDirectory("mv-ev").toFile
    try {
      MatView.buildEventState(ev.filter(day < lastDay), s"${dir.getPath}/state")
      // a one-day serve reads a strict file subset (day is a partition col)
      val st = spark.read.parquet(s"${dir.getPath}/state")
      val all = st.select(input_file_name()).distinct().count()
      val oneDay = st.filter(col("day") === (lastDay - 1))
        .select(input_file_name()).distinct().count()
      assert(oneDay > 0 && oneDay < all, s"one-day=$oneDay all=$all")
      // merged view ≡ one-pass recompute over every event
      val merged = MatView.rollForwardEvents(spark, s"${dir.getPath}/state",
        ev.filter(day === lastDay))
      val full = MatView.eventPartials(ev)
      val canonEv = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("day", "event_type").collect().map(_.toString).toSeq
      assert(canonEv(merged) === canonEv(full))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming rollup: interleaved micro-batches converge to the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import graft.streaming.EventStream.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, dayOff: Long, typ: String, v: Double) =
      Event(id, new java.sql.Timestamp((1700000000L + dayOff * 86400 + id) * 1000L),
        id % 3, typ, v)
    val b1 = Seq(ev(1, 0, "view", 1.25), ev(2, 0, "click", 2.50), ev(3, 1, "view", 0.75))
    val b2 = Seq(ev(4, 0, "view", 4.00), ev(5, 2, "purchase", 9.99)) // day 0 again
    val dir = Files.createTempDirectory("mv-stream").toFile
    try {
      val input = MemoryStream[Event]
      val q = EventStream.eventRollupStream(input.toDF(), s"${dir.getPath}/state")
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      q.stop()
      val state = spark.read.parquet(s"${dir.getPath}/state")
        .withColumn("day", col("day").cast("long"))
      val full = MatView.eventPartials((b1 ++ b2).toDF())
      val canonEv = (df: org.apache.spark.sql.DataFrame) =>
        df.select("day", "event_type", "n_events", "sum_val")
          .orderBy("day", "event_type").collect().map(_.toString).toSeq
      assert(canonEv(state) === canonEv(full))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("streaming histogram: interleaved micro-batches converge to the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import graft.streaming.EventStream.Event
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, typ: String, v: Double) =
      Event(id, new java.sql.Timestamp((1700000000L + id) * 1000L), id % 3, typ, v)
    // same (type, cent) cell hit across batches — the merge path that matters
    val b1 = Seq(ev(1, "view", 1.25), ev(2, "click", 2.50), ev(3, "view", 1.25))
    val b2 = Seq(ev(4, "view", 1.25), ev(5, "view", 7.75), ev(6, "purchase", 9.99))
    val dir = Files.createTempDirectory("mv-hist-stream").toFile
    try {
      val input = MemoryStream[Event]
      val q = EventStream.histogramStream(input.toDF(), s"${dir.getPath}/state")
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      q.stop()
      val state = spark.read.parquet(s"${dir.getPath}/state")
      val full = MatView.histPartials((b1 ++ b2).toDF())
      val canonH = (df: org.apache.spark.sql.DataFrame) =>
        df.select("event_type", "v100", "cnt")
          .orderBy("event_type", "v100").collect().map(_.toString).toSeq
      assert(canonH(state) === canonH(full))
      // the (view, 125) cell must have merged across batches: 3 hits
      assert(state.filter(col("event_type") === "view" && col("v100") === 125)
        .head.getAs[Long]("cnt") === 3L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
