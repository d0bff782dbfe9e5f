package graft.operators

import graft.SparkSpec

/** Spatial adjacency (Geo): correctness of the certified grid ladder
  * against in-test brute force, and the plan shapes a 100 TB run needs —
  * every level is a hash equi-join, never a nested-loop or cartesian. */
class GeoSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private val D = 1024L

  /** In-test brute force over the same synthetic coordinates. */
  private def brute(): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
    import graft.Tables
    val pts = Tables(spark, dir, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), (r.getLong(0) * 37) % D, (r.getLong(0) * 91) % D))
    val st = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), (r.getLong(0) * 53) % D, (r.getLong(0) * 71) % D))
    def d2(px: Long, py: Long, sx: Long, sy: Long) =
      (px - sx) * (px - sx) + (py - sy) * (py - sy)
    val knn = pts.toSeq.map { case (pid, _, px, py) =>
      val (sid, dd) = st.map { case (sid, _, sx, sy) => (sid, d2(px, py, sx, sy)) }
        .minBy { case (sid, dd) => (dd, sid) }
      (pid, sid, dd)
    }
    val radius = pts.toSeq.flatMap { case (pid, _, px, py) =>
      st.collect { case (sid, _, sx, sy) if d2(px, py, sx, sy) <= 10000L =>
        (pid, sid, d2(px, py, sx, sy))
      }
    }
    val country = pts.toSeq.flatMap { case (pid, pn, px, py) =>
      val same = st.filter(_._2 == pn)
      if (same.isEmpty) None
      else {
        val (sid, dd) = same.map { case (sid, _, sx, sy) => (sid, d2(px, py, sx, sy)) }
          .minBy { case (sid, dd) => (dd, sid) }
        Some((pid, sid, dd))
      }
    }
    (knn, radius, country)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("geo01: certified grid nearest equals brute force") {
    val (knn, _, _) = brute()
    assert(rows(Geo.geo01GridKnn(spark, dir)) == knn.toSet)
    assert(knn.nonEmpty)
  }

  test("geo02: grid radius join equals the cross filter") {
    val (_, radius, _) = brute()
    assert(rows(Geo.geo02RadiusJoin(spark, dir)) == radius.toSet)
    assert(radius.nonEmpty)
  }

  test("geo03: per-country nearest equals brute force; siteless countries drop") {
    val (_, _, country) = brute()
    assert(rows(Geo.geo03CountryKnn(spark, dir)) == country.toSet)
    // sf0.001 has 10 suppliers over 25 nations, so the inner-join drop
    // semantics must actually fire for this test to mean anything
    val nPts = graft.Tables(spark, dir, "customer").count()
    assert(country.size < nPts, "expected some customers in siteless nations")
  }

  test("geo04: certified top-3 equals brute force, ranks included") {
    import graft.Tables
    val pts = Tables(spark, dir, "customer").select("c_custkey").collect()
      .map(r => (r.getLong(0), (r.getLong(0) * 37) % D, (r.getLong(0) * 91) % D))
    val st = Tables(spark, dir, "supplier").select("s_suppkey").collect()
      .map(r => (r.getLong(0), (r.getLong(0) * 53) % D, (r.getLong(0) * 71) % D))
    val expected = pts.toSeq.flatMap { case (pid, px, py) =>
      st.map { case (sid, sx, sy) =>
        (sid, (px - sx) * (px - sx) + (py - sy) * (py - sy))
      }.sortBy { case (sid, dd) => (dd, sid) }.take(3).zipWithIndex.map {
        case ((sid, dd), i) => (pid, sid, i + 1, dd)
      }
    }.toSet
    val got = Geo.geo04TopkKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("geo plans: every level is a hash equi-join — no NLJ, no cartesian") {
    // The ladder localCheckpoints each level, so the final plan no longer
    // shows the level joins — pin the LEVEL plan itself (the shape every
    // level executes), for each cell size and for the keyed geo03 variant.
    val pts = Geo.points(spark, dir)
    val st = Geo.sites(spark, dir)
    for (g <- Seq(128L, 512L, 2048L); keys <- Seq(Seq.empty[String], Seq("nat"))) {
      val plan = Geo.levelCandidates(pts, st, g, keys)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
    }
    // geo02 is a single un-checkpointed level end-to-end
    val p2 = Geo.geo02RadiusJoin(spark, dir).queryExecution.executedPlan.toString
    assert(!p2.contains("BroadcastNestedLoopJoin"), p2.take(2000))
    assert(!p2.contains("CartesianProduct"), p2.take(2000))
  }
}
