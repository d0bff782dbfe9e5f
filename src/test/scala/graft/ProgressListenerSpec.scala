package graft

import scala.collection.mutable

/** The D5 progress listener must see real task metrics and format the
  * operator-facing lines; the stall detector must fire exactly once per
  * quiet stage. */
class ProgressListenerSpec extends SparkSpec {

  test("accumulates task/record counts and reports progress lines") {
    val seen = mutable.ArrayBuffer.empty[String]
    val pl = new ProgressListener(intervalMs = 100, log = s => seen.synchronized { seen += s })
    spark.sparkContext.addSparkListener(pl)
    try {
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      // listener events are async — poll until the active map drains
      val deadline = System.currentTimeMillis() + 10000
      while (pl.statusLines().nonEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(pl.statusLines().isEmpty)
    } finally spark.sparkContext.removeSparkListener(pl)
  }

  test("status line format carries tasks, rows, MB and rows/s") {
    val pl = new ProgressListener()
    val ev = org.apache.spark.scheduler.SparkListenerStageSubmitted(
      new org.apache.spark.scheduler.StageInfo(7, 0, "parquet at Main.scala:90",
        32, Seq.empty, Seq.empty, "details", resourceProfileId = 0))
    pl.onStageSubmitted(ev)
    val lines = pl.statusLines()
    assert(lines.size === 1)
    assert(lines.head.contains("stage 7"))
    assert(lines.head.contains("0/32 tasks"))
  }

  test("stall warning fires once after stallAfterMs of no completions") {
    val pl = new ProgressListener(stallAfterMs = 50)
    pl.onStageSubmitted(org.apache.spark.scheduler.SparkListenerStageSubmitted(
      new org.apache.spark.scheduler.StageInfo(9, 0, "stuck stage",
        4, Seq.empty, Seq.empty, "details", resourceProfileId = 0)))
    Thread.sleep(80)
    val w1 = pl.stalled()
    assert(w1.size === 1 && w1.head.contains("WARNING") && w1.head.contains("stage 9"))
    assert(pl.stalled().isEmpty, "warning must not repeat for the same stage")
  }
}
