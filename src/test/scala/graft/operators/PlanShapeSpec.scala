package graft.operators

import graft.SparkSpec

/** Plan-shape regression tests: the physical properties that matter at
  * 100 TB must survive refactors — filter pushdown to the parquet scan,
  * column pruning, and broadcast joins for the small dimensions. */
class PlanShapeSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q01: shipdate filter reaches the scan; unused columns pruned") {
    val plan = Relational.q01PricingAgg(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), plan.take(2000))
    // 6 of 11 lineitem columns are needed; the scan schema must not list tax
    assert(!plan.contains("l_tax"), "l_tax should be pruned from the scan")
  }

  test("q12: nation and region join as broadcasts") {
    val plan = Relational.q12RevenueByRegion(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q08: prefix theta-join stays hash-joinable (no nested loop)") {
    val plan = Relational.q08PrefixLangJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
