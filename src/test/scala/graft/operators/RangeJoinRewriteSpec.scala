package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RewriteRangeJoin: a pure range-condition join (Spark's BNLJ shape)
  * becomes a binned hash equi-join when the binWidth conf is set —
  * identical rows, including negative domains (the ±1 bin margin) and
  * boundary values; untouched when an equi key already exists or the
  * conf is off. */
class RangeJoinRewriteSpec extends SparkSpec {

  private val key = "spark.graft.rangeJoin.binWidth"

  private def withBin[T](w: Long)(f: => T): T = {
    spark.conf.set(key, w.toString)
    try f finally spark.conf.unset(key)
  }

  test("range-only join is rewritten to a binned hash join with equal rows") {
    import spark.implicits._
    val points = (1L to 2000L).map(i => (i, i * 7 % 1000)).toDF("pid", "x")
    val ivals = (1L to 200L).map(i => (i, i * 5 - 3, i * 5 + 40)).toDF("iid", "lo", "hi")
    def q = points.join(ivals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("pid"), col("iid"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (rewritten, plan) = withBin(50L) {
      (q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === naive)
    assert(naive.nonEmpty)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("Generate explode"), plan.take(3000))
  }

  test("negative domains stay exact through the truncation margin") {
    import spark.implicits._
    val points = (-500L to 500L).map(i => (i, i * 3 % 400)).toDF("pid", "x")
    val ivals = (-40L to 40L).map(i => (i, i * 9 - 11, i * 9 + 13)).toDF("iid", "lo", "hi")
    def q = points.join(ivals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("pid"), col("iid"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rewritten = withBin(16L) {
      q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(rewritten === naive)
    assert(naive.nonEmpty)
  }

  test("joins with an equi key are left alone") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i % 5, i)).toDF("k", "x")
    val b = (1L to 20L).map(i => (i % 5, i - 3, i + 3)).toDF("k", "lo", "hi")
    def q = a.join(b, a("k") === b("k") && col("x") >= col("lo") && col("x") <= col("hi"))
    val plan = withBin(10L) { q.queryExecution.executedPlan.toString }
    assert(!plan.contains("Generate explode"), plan.take(3000))
  }

  test("conf off leaves the nested-loop plan untouched") {
    import spark.implicits._
    val a = (1L to 10L).map(i => (i, i)).toDF("pid", "x")
    val b = (1L to 3L).map(i => (i, i - 1, i + 1)).toDF("iid", "lo", "hi")
    val plan = a.join(b, col("x") >= col("lo") && col("x") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"), plan.take(2000))
  }
}
