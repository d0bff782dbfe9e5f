package graft.operators

import graft.SparkSpec

/** Min-label propagation must find exact components on a graph whose
  * shape exercises multi-round convergence: a 4-node chain (diameter 3),
  * a triangle, and an isolated edge. */
class ConnectedComponentsSpec extends SparkSpec {

  test("empty edge set gives empty components (no null-sum crash)") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Relational.connectedComponents(edges).count() == 0)
  }

  test("components of chain + triangle + pair") {
    import spark.implicits._
    // chain 10-11-12-13, triangle 20-21-22, pair 30-31
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L)).toDF("a", "b")
    val got = Relational.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L), got.toString)
  }
}
