package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C21's other half: `saltedJoin` is the MANUAL skew tool; this pins that
  * Spark's own AQE skew-join split (OptimizeSkewedJoin) fires on the same
  * hot-key shape when the join is a shuffle sort-merge join — so at 100 TB
  * the first line of defense is a conf, not code. The thresholds are
  * lowered to make a local[4]-sized hot key "skewed" by AQE's definition
  * (factor × median AND absolute byte floor); production keeps defaults.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force sort-merge
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = 17L
      // ~80% of left rows carry one key, with a fat payload so the hot
      // shuffle partition crosses the lowered byte threshold
      val left = spark.range(40000).select(
        when(col("id") % 5 =!= 0, lit(hot)).otherwise(col("id") % 97).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("payload"))
      val right = spark.range(97).select(col("id").as("rk"),
        (col("id") * 2).as("attr"))
      val joined = left.join(right, col("k") === col("rk"))
      // collect() drives THIS DataFrame's QueryExecution, so the adaptive
      // plan below is the executed one (count() would plan separately)
      val n = joined.collect().length
      assert(n == 40000, s"join row count $n")
      // after execution the adaptive plan records the skew split
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "expected OptimizeSkewedJoin to mark the SMJ skewed\n" +
          finalPlan.take(3000))
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
