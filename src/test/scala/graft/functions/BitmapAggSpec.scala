package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bitmap aggregate's algebra: OR-merge associativity across any
  * partitioning (the TypedImperativeAggregate partial-merge contract),
  * set semantics vs COUNT DISTINCT, bytewise intersection popcount, and
  * the loud out-of-range fence. */
class BitmapAggSpec extends SparkSpec {

  test("bitmap cardinality equals COUNT DISTINCT under any partitioning") {
    import spark.implicits._
    val ids = (1L to 1000L).map(i => (i % 7, i % 211)) // dup ids per group
    for (parts <- Seq(1, 4)) {
      val df = ids.toDF("g", "id").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(expr("bitmap_cardinality(bitmap_agg(id))").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = ids.groupBy(_._1).map { case (g, v) => (g, v.map(_._2).distinct.length.toLong) }
      assert(got === want, s"parts=$parts")
    }
  }

  test("and-cardinality equals exact set intersection, asymmetric lengths included") {
    import spark.implicits._
    // group 0 holds small ids (short bitmap), group 1 a large id (long bitmap)
    val rows = Seq((0L, 1L), (0L, 5L), (0L, 64L), (1L, 5L), (1L, 64L), (1L, 5000L))
    val bm = rows.toDF("g", "id").groupBy(col("g"))
      .agg(expr("bitmap_agg(id)").as("bm"))
    val n = bm.as("a").join(bm.as("b"), col("a.g") < col("b.g"))
      .select(expr("bitmap_and_cardinality(a.bm, b.bm)")).head().getLong(0)
    assert(n === 2L) // {5, 64}
  }

  test("out-of-range ids fail loudly instead of aliasing") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((1L << 27)).toDF("id").agg(expr("bitmap_agg(id)")).collect()
    }
    assert(err.getMessage != null)
  }
}
