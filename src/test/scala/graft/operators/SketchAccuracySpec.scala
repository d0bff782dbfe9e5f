package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q29's sketches are approximations with DECLARED error bounds — this
  * spec makes those bounds enforceable instead of "runs, rows > 0":
  *  - approx_count_distinct(rsd = 0.01): HLL++ standard error is 1% —
  *    assert relative error ≤ 5 % (5 σ; the sketch is deterministic for a
  *    given input, so this cannot flake, only genuinely regress).
  *  - percentile_approx(accuracy = 1000): the returned value's RANK must
  *    be within 1/1000 of the target percentile (KLL-style guarantee) —
  *    assert a generous 5 ‰ two-sided rank window, tie-aware
  *    (count(< v) ≤ (p+ε)·n and count(≤ v) ≥ (p−ε)·n).
  */
class SketchAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val ndRelTol = 0.05
  private val rankTol = 0.005

  test("q29: HLL++ distinct counts within 5x declared rsd of exact") {
    val li = Tables(spark, dir, "lineitem")
    val got = Relational.q29Sketches(spark, dir)
      .join(li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_nd")),
        Seq("l_returnflag"))
      .select(col("l_returnflag"), col("nd_parts"), col("exact_nd"))
      .collect()
    assert(got.length == 3, got.mkString(","))
    got.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(approx - exact) / exact
      assert(rel <= ndRelTol,
        f"${r.getString(0)}: nd_parts=$approx%.0f exact=$exact%.0f rel=$rel%.4f")
    }
  }

  test("q29: approx percentiles within 5 per-mille rank error of target") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).cache()
    try {
      val rows = Relational.q29Sketches(spark, dir).collect()
      for (r <- rows; (p, colIdx) <- Seq((0.5, 2), (0.99, 3))) {
        val flag = r.getString(0)
        val v = r.getDouble(colIdx)
        val grp = li.filter(col("l_returnflag") === flag)
        val n = grp.count().toDouble
        val below = grp.filter(col("l_extendedprice") < v).count() / n
        val atOrBelow = grp.filter(col("l_extendedprice") <= v).count() / n
        assert(below <= p + rankTol && atOrBelow >= p - rankTol,
          f"$flag p$p: value=$v%.2f rank∈[$below%.4f,$atOrBelow%.4f]")
      }
    } finally li.unpersist()
  }
}
