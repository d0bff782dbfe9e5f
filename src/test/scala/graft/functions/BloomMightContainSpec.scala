package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native Bloom membership expression: the contract is NO false negatives
  * (a dropped true candidate would silently lose triangles/dups), bounded
  * false positives (they only cost confirm-join work), and evaluation via
  * the registered codegen expression, not a UDF. */
class BloomMightContainSpec extends SparkSpec {

  test("no false negatives, bounded false positives, codegen-registered") {
    import spark.implicits._
    val keys = (1L to 1000L).map(_ * 7)
    val bloom = keys.toDF("k").stat.bloomFilter("k", 1000, 0.01)
    val bytes = BloomMightContain.serialize(bloom)
    // spark.range, not a local Seq: ConvertToLocalRelation would eval the
    // projection at optimization time and leave no expression in the plan
    val df = spark.range(1, 7001).select(col("id").as("x"))
      .withColumn("hit", call_function("bloom_might_contain", col("x"), lit(bytes)))
    val hits = df.filter(col("hit")).select("x").as[Long].collect().toSet
    assert(keys.forall(hits), "false negative: a built key failed the test")
    val fp = (hits -- keys).size
    // 6000 non-members at fpp=0.01 → expect ~60; allow generous slack
    assert(fp < 300, s"false-positive count $fp implausibly high")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(1500))
  }

  test("analysis rejects non-binary or non-foldable filter argument") {
    import spark.implicits._
    val df = (1L to 10L).toDF("x")
    intercept[Exception] {
      df.withColumn("hit",
        call_function("bloom_might_contain", col("x"), col("x"))).collect()
    }
  }

  test("broadcast-handle variant agrees with the literal form, codegen'd, null-safe") {
    import spark.implicits._
    val keys = (1L to 500L).map(_ * 13)
    val bloom = keys.toDF("k").stat.bloomFilter("k", 500, 0.01)
    val bytes = BloomMightContain.serialize(bloom)
    val bc = spark.sparkContext.broadcast(bloom)
    def bcCol(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        BloomMightContainBC(org.apache.spark.sql.graft.ColumnShim.expression(c), bc))
    val df = spark.range(1, 4001).select(col("id").as("x"))
      .withColumn("lit_hit", call_function("bloom_might_contain", col("x"), lit(bytes)))
      .withColumn("bc_hit", bcCol(col("x")))
    // same filter ⇒ bit-identical decisions, member or not
    assert(df.filter(col("lit_hit") =!= col("bc_hit")).isEmpty,
      "broadcast and literal forms disagree")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_bc"), plan.take(1500))
    // null key → null out (UnaryExpression null-safety), no NPE
    val withNull = spark.range(1, 3).select(
      when(col("id") === 1, col("id") * 13).as("x"))
      .withColumn("hit", bcCol(col("x")))
    assert(withNull.filter(col("x").isNull && col("hit").isNull).count() == 1)
  }
}
