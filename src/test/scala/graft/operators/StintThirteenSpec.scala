package graft.operators

import graft.SparkSpec

/** Thirteenth-stint operators, each verified by independent in-test
  * recomputation (never by re-running the operator's own plan):
  *  - q58 nearest-event join vs a brute-force per-click argmin
  *  - cc13 capped common-neighbor link prediction vs a Scala reimplementation
  *  - dd20 semantic dedup's keep/drop law given its cluster assignment
  *  - tp09 funnel chaining + agreement with dd07 (same first two tiers)
  * plus the plan shapes that must survive refactors (no nested-loop pair
  * joins, top-k never a global sort).
  */
class StintThirteenSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q58: every click matched to the true nearest view, backward ties win") {
    val got = EventOps.q58NearestEvent(spark, dir).collect()
      .map(r => (r.getLong(0), (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val ev = graft.Tables(spark, dir, "events")
      .selectExpr("event_id", "cast(unix_timestamp(ts) as long) es",
        "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = ev.filter(_._4 == "view")
      .groupBy(e => (e._3, e._2))                       // (user, second)
      .map { case ((u, es), g) => (u, es, g.map(_._1).max) }.toSeq
    val byUser = views.groupBy(_._1)
    var checked = 0
    for ((cid, ces, cu, _) <- ev.filter(_._4 == "click")) {
      val vs = byUser.getOrElse(cu, Seq.empty)
      val expect =
        if (vs.isEmpty) (None, None)
        else {
          // backward wins ties: strictly smaller |dt|, or equal with ve <= ces
          val best = vs.minBy { case (_, ve, _) =>
            (math.abs(ve - ces), if (ve <= ces) 0 else 1) }
          (Some(best._3), Some(best._2))
        }
      assert(got(cid) == expect, s"click $cid: got ${got(cid)}, want $expect")
      checked += 1
    }
    assert(checked > 100, s"only $checked clicks — fixture too small to trust")
  }

  test("q58: both directional frames share one Window operator and one sort") {
    val plan = EventOps.q58NearestEvent(spark, dir)
      .queryExecution.executedPlan.toString
    def n(tok: String) = plan.sliding(tok.length).count(_ == tok)
    // bidirectionality must be free: backward + forward carries fuse into
    // ONE Window over ONE sort — a second sort or window here means the
    // frames stopped sharing their ordering
    assert(n("Window [") == 1, plan.take(1500))
    assert(n("Sort [") == 1, plan.take(1500))
  }

  test("cc13: matches a Scala reimplementation of the capped wedge count") {
    val rows = Dedup.cc13LinkPredict(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val l = graft.Tables(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = l.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (e.toSeq.map(p => (p._1, p._2)) ++ e.toSeq.map(p => (p._2, p._1)))
    val deg = adj.groupBy(_._1).map { case (n, g) => (n, g.size.toLong) }
    val capped = adj.groupBy(_._1).toSeq.flatMap { case (n, g) =>
      g.map(_._2).sorted.take(32).map((n, _)) }
    val common = capped.groupBy(_._1).values.flatMap { g =>
      val ns = g.map(_._2).toSeq.sorted
      for (i <- ns.indices; j <- (i + 1) until ns.size) yield (ns(i), ns(j))
    }.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
      .filter { case ((u, v), _) => !e.contains((u, v)) }
    val expect = common.toSeq
      .map { case ((u, v), c) =>
        (u, v, c, deg(u), deg(v), c * 1000 / (deg(u) + deg(v) - c)) }
      .sortBy { case (u, v, c, _, _, _) => (-c, u, v) }.take(50)
    assert(rows.toSeq == expect,
      s"first diff: ${rows.toSeq.zip(expect).find(p => p._1 != p._2)}")
  }

  test("cc13: top-N is TakeOrdered, pair join is keyed (no nested loop)") {
    val plan = Dedup.cc13LinkPredict(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("dd20: drop law — dropped iff a smaller-id cos>=0.4 neighbor shares the cluster") {
    val out = Dedup.dd20Semdedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val cluster = out.map(r => (r._1, r._2)).toMap
    val vecs = graft.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(x * 1000) as bigint)) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def similar(a: Array[Long], b: Array[Long]): Boolean = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val (na, nb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      dot > 0 && dot * dot * 25 >= na * nb * 4
    }
    assert(out.nonEmpty && out.exists(!_._3),
      "fixture must contain at least one semantic duplicate")
    for ((id, cl, keep) <- out) {
      val hasSmaller = vecs.keys.exists(o => o < id && cluster(o) == cl &&
        similar(vecs(o), vecs(id)))
      assert(keep == !hasSmaller, s"vec $id: keep=$keep but hasSmaller=$hasSmaller")
    }
  }

  test("dd20: pair scan joins on the cluster key (no cartesian)") {
    val plan = Dedup.dd20Semdedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("geo05: cell-join dedup equals the brute all-pairs law; no cross product") {
    // sf0.01: 100 sites — the smaller fixture has no two sites within ε
    val gdir = "/root/testdata/sf0.01"
    val out = Geo.geo05SpatialDedup(spark, gdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val sites = graft.Tables(spark, gdir, "supplier")
      .selectExpr("s_suppkey").collect().map(_.getLong(0))
      .map(k => (k, (k * 53) % 1024, (k * 71) % 1024))
    for ((id, n, keep) <- out) {
      val (_, x, y) = sites.find(_._1 == id).get
      val smaller = sites.count { case (o, ox, oy) =>
        o < id && (ox - x) * (ox - x) + (oy - y) * (oy - y) <= 32 * 32 }
      assert(n == smaller && keep == (smaller == 0), s"site $id: $n vs $smaller")
    }
    assert(out.exists(!_._3), "fixture must contain at least one spatial dup")
    val plan = Geo.geo05SpatialDedup(spark, gdir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("tp09: stages chain, and the first two tiers agree with dd07") {
    val rows = Dedup.tp09DedupFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("exact", "lexical", "semantic"))
    for ((_, st, nIn, nRm, nOut) <- rows)
      assert(nIn - nRm == nOut && nRm >= 0, s"$st: $nIn - $nRm != $nOut")
    assert(rows(0)._5 == rows(1)._3 && rows(1)._5 == rows(2)._3,
      s"stage outputs must chain: $rows")
    val dd07Survivors = Dedup.dd07DedupPipeline(spark, dir).count()
    assert(rows(1)._5 == dd07Survivors,
      s"lexical n_out ${rows(1)._5} != dd07 survivors $dd07Survivors")
  }
}
