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

  test("long chain (diameter 24) converges exactly, one round per hop") {
    import spark.implicits._
    // Pure min-label propagation needs `diameter` rounds on a path graph —
    // this pins both exactness on the worst-case shape and the round cost
    // a web-scale graph would pay (where large-star/small-star's
    // O(log d) rounds, noted in connectedComponents' scaladoc, take over).
    // Node ids descend along the chain so labels must flow AGAINST the id
    // order the whole way.
    val nodes = (0 to 24).map(i => 1000L - i)
    val edges = nodes.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val got = Relational.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 25)
    assert(got.values.toSet == Set(976L), // min id = 1000 - 24
      s"all 25 chain nodes must share the min label; got ${got.values.toSet}")
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

  test("star variant: identical components on chain + triangle + pair") {
    import spark.implicits._
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L)).toDF("a", "b")
    val got = Relational.connectedComponentsStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L), got.toString)
  }

  test("star variant: empty edge set gives empty components") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Relational.connectedComponentsStar(edges).count() == 0)
  }

  test("star variant: diameter-24 chain in O(log d) rounds, not O(d)") {
    import spark.implicits._
    val nodes = (0 to 24).map(i => 1000L - i)
    val edges = nodes.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    var rounds = 0
    val got = Relational.connectedComponentsStar(edges, r => rounds = r)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 25 && got.values.toSet == Set(976L), got.toString)
    // label propagation needs 24 rounds on this graph; star-contraction
    // must stay logarithmic (8 rounds is generous vs the 24 hops)
    assert(rounds <= 8, s"expected O(log d) convergence, took $rounds rounds")
  }

  test("star variant agrees with label propagation on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: 120 nodes, ~90 edges from an LCG
    var x = 1234567L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
    val edges = (1 to 90).map { _ =>
      (next() % 120, next() % 120)
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val viaLabels = Relational.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaStars = Relational.connectedComponentsStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStars == viaLabels,
      s"disagree: ${viaStars.toSet.diff(viaLabels.toSet)} vs ${viaLabels.toSet.diff(viaStars.toSet)}")
  }
}
