package graft.operators

import graft.SparkSpec

/** Sixteenth-stint operators, each verified by independent in-test
  * recomputation (never by re-running the operator's own plan):
  *  - Relational.stronglyConnectedComponents vs Tarjan on hand-built
  *    graphs AND on the real cc17 transition graph
  *  - dd24 span excision vs a brute Scala interval-cut
  *  - mv07 join roll-forward vs the direct join, plus the delta-algebra
  *    disjointness law
  *  - tx25 RRF fusion vs a Scala fusion of a brute dense rank and the
  *    lexical list
  *  - geo07 density clusters vs union-find over brute-counted cells
  */
class StintSixteenSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  val dir01 = "/root/testdata/sf0.01"

  // -- Tarjan's SCC (iterative), the classic single-node reference ------
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val g = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
      .withDefaultValue(Seq.empty)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val idx = collection.mutable.Map[Long, Int]()
    val low = collection.mutable.Map[Long, Int]()
    val onStk = collection.mutable.Set[Long]()
    val stk = collection.mutable.ArrayBuffer[Long]()
    var counter = 0
    val sccOf = collection.mutable.Map[Long, Long]()
    for (root <- nodes if !idx.contains(root)) {
      val call = collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      while (call.nonEmpty) {
        val (v, pi) = call.last
        if (pi == 0) {
          idx(v) = counter; low(v) = counter; counter += 1
          stk += v; onStk += v
        }
        var descended = false
        var i = pi
        val succ = g(v)
        while (i < succ.length && !descended) {
          val w = succ(i)
          if (!idx.contains(w)) {
            call(call.length - 1) = (v, i + 1)
            call += ((w, 0))
            descended = true
          } else {
            if (onStk(w)) low(v) = math.min(low(v), idx(w))
            i += 1
          }
        }
        if (!descended) {
          if (low(v) == idx(v)) {
            val comp = collection.mutable.ArrayBuffer[Long]()
            var w = -1L
            while (w != v) {
              w = stk.remove(stk.length - 1); onStk -= w; comp += w
            }
            val id = comp.min
            comp.foreach(sccOf(_) = id)
          }
          call.remove(call.length - 1)
          if (call.nonEmpty) {
            val p = call.last._1
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    sccOf.toMap
  }

  private def sccResult(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    Relational.stronglyConnectedComponents(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("scc: hand-built graphs — cycles, chains of SCCs, self-structure") {
    // two 3-cycles bridged one-way + a tail: SCCs {1,2,3}, {4,5,6}, {7}
    val g1 = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7))
    assert(sccResult(g1) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
    assert(sccResult(g1) == tarjan(g1))
    // pure DAG: all singletons
    val g2 = Seq[(Long, Long)]((10, 11), (11, 12), (10, 12))
    assert(sccResult(g2) == Map(10L -> 10L, 11L -> 11L, 12L -> 12L))
    // cycle reached only VIA a smaller id (root of color class not in the
    // cycle): peel must take a second round
    val g3 = Seq[(Long, Long)]((1, 5), (5, 6), (6, 5))
    assert(sccResult(g3) == Map(1L -> 1L, 5L -> 5L, 6L -> 5L))
    assert(sccResult(g3) == tarjan(g3))
  }

  test("ccJump: pointer-jumping CC handles a diameter-63 chain and forests") {
    import spark.implicits._
    val chain = (0L until 63L).map(i => (i, i + 1))
    val forest = chain ++ Seq((100L, 101L), (101L, 102L), (200L, 201L))
    val got = Relational.connectedComponentsJump(forest.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = (0L to 63L).map((_, 0L)) ++
      Seq(100L -> 100L, 101L -> 100L, 102L -> 100L, 200L -> 200L, 201L -> 200L)
    assert(got == expect.toMap)
  }

  test("cc17: matches Tarjan on the real transition graph") {
    val edges = Dedup.transitionEdges(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    val got = Dedup.cc17Scc(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == tarjan(edges))
    // the clickstream core: one dominant loop plus fringe singletons
    val sizes = got.groupBy(_._2).map(_._2.size)
    assert(sizes.max > 1 && sizes.count(_ == 1) > 0)
  }

  test("cc18: condensation layers match Scala longest-path over Tarjan SCCs") {
    val edges = Dedup.transitionEdges(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sccOf = tarjan(edges)
    val cond = edges.map { case (s, d) => (sccOf(s), sccOf(d)) }
      .filter { case (a, b) => a != b }.distinct
    val preds = cond.groupBy(_._2).map { case (k, v) => (k, v.map(_._1)) }
    val memo = collection.mutable.Map[Long, Long]()
    def layer(v: Long): Long = memo.getOrElseUpdate(v,
      preds.get(v).map(_.map(layer).max + 1).getOrElse(0L))
    val sizes = sccOf.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val expect = sizes.map { case (id, n) => (id, (n, layer(id))) }
    val got = Dedup.cc18Condensation(spark, dir01).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    // a DAG with real depth, not a single layer
    assert(got.values.map(_._2).max >= 2)
  }

  test("dc06: matches a brute Scala eval-vs-train cosine screen") {
    val vecs = graft.Tables(spark, dir01, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor((x * 1000.0f).toDouble).toLong)))
    val nrm = vecs.map { case (id, v) => (id, v.map(x => x * x).sum) }.toMap
    val ev = vecs.filter(_._1 % 50 == 0)
    val tr = vecs.filter(_._1 % 50 != 0)
    val expect = tr.flatMap { case (tid, tv) =>
      val hits = ev.flatMap { case (eid, evv) =>
        val dot = tv.zip(evv).map { case (a, b) => a * b }.sum
        if (dot > 0 && 25 * dot * dot >= 4 * nrm(tid) * nrm(eid))
          Some((eid, dot)) else None
      }
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (eid, dot) => (-dot, eid) }
        Some((tid, (hits.size.toLong, best._1, best._2)))
      }
    }.toMap
    val got = Curation.dc06SemanticDecontaminate(spark, dir01).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q62: trigram paths match a Scala recount of per-user sequences") {
    val ev = graft.Tables(spark, dir01, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full sub-second precision: (epoch seconds, nanos) sorts like ts
        (r.getLong(0), (t.getTime / 1000, t.getNanos), r.getLong(2),
          r.getString(3))
      }
    val tri = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val seq = g.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3).map(w => (w(0), w(1), w(2)))
    }
    val counts = tri.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val expect = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20).zipWithIndex
      .map { case ((k, n), i) => (k, (n, i + 1)) }.toMap
    val got = EventOps.q62EventPaths(spark, dir01).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getInt(4)))).toMap
    assert(got == expect)
  }

  test("mv08: distinct-set union state equals one-pass COUNT DISTINCT") {
    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (lang, g) =>
      (lang, g.flatMap(_._2.split(' ').filter(_.nonEmpty)).toSet.size.toLong)
    }
    val got = MatView.mv08DistinctRollforward(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
      .trim.split(' ').filter(_.nonEmpty).toSeq

  test("dd24: matches a brute Scala excision of the dd22 spans") {
    val spans = Curation.dd22SharedSpans(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))) // (doc_b, b_start, n)
    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), normToks(r.getString(1)))).toMap
    val cut = spans.groupBy(_._1).map { case (d, ss) =>
      val remove = ss.flatMap { case (_, s, n) => s until (s + n) }.toSet
      (d, remove)
    }.withDefaultValue(Set.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(toks: Seq[String]): Long =
      java.lang.Long.parseLong(
        md.digest(toks.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
    val expect = docs.map { case (d, toks) =>
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !cut(d)((i + 1).toLong) => t
      }
      (d, (toks.size.toLong, (toks.size - kept.size).toLong,
        kept.size.toLong, fp(kept)))
    }
    val got = Curation.dd24SpanExcision(spark, dir).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
    // the operator must actually cut something at this SF
    assert(got.values.exists(_._2 > 0))
  }

  test("mv07: delta-join roll-forward equals the direct join; terms disjoint") {
    import org.apache.spark.sql.functions._
    val got = MatView.mv07JoinRollforward(spark, dir)
    val orders = graft.Tables(spark, dir, "orders")
    val cust = graft.Tables(spark, dir, "customer")
    val full = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_nationkey"),
        col("o_totalprice"))
    // set equality AND multiset equality (no row double-covered by terms)
    assert(got.count() == full.count())
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("tx25: fused ranking equals Scala RRF of the two sides") {
    import spark.implicits._
    val lex = TextOps.tx23Bm25(spark, dir01).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getInt(2))).toMap
    // brute dense rank: quantized dot against probe vectors 100·qid
    val vecs = graft.Tables(spark, dir01, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor((x * 1000.0f).toDouble).toLong)))
      .toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val dense = (1 to 4).flatMap { qid =>
      val q = vecs(qid * 100L)
      vecs.toSeq.filter(_._1 != qid * 100L)
        .map { case (id, v) => (id, dot(q, v)) }
        .sortBy { case (id, d) => (-d, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => ((qid, id), i + 1) }
    }.toMap
    val expect = (1 to 4).flatMap { qid =>
      val cands = (lex.keySet ++ dense.keySet).filter(_._1 == qid)
      cands.toSeq.map { k =>
        val s = lex.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          dense.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (k, s)
      }.sortBy { case ((_, id), s) => (-s, id) }.take(10).zipWithIndex
        .map { case (((q, id), s), i) =>
          ((q, id), (lex.get((q, id)), dense.get((q, id)), s, i + 1)) }
    }.toMap
    val got = TextOps.tx25HybridRrf(spark, dir01).collect()
      .map { r =>
        ((r.getInt(0), r.getLong(1)),
          (if (r.isNullAt(2)) None else Some(r.getInt(2)),
            if (r.isNullAt(3)) None else Some(r.getInt(3)),
            r.getLong(4), r.getInt(5)))
      }.toMap
    assert(got == expect)
    // fusion genuinely mixes: some fused top-10 rows are dense-only
    assert(got.values.exists(v => v._1.isEmpty && v._2.isDefined))
  }

  test("ss34: tombstoned serving — no dead ids, ss03's alive order preserved") {
    val got = Similarity.ss34AnnTombstoned(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (q, c, _) => q % 9 != 0 && c % 9 != 0 })
    assert(got.map(_._1).toSet == Set(100L, 200L, 300L, 400L))
    // shared tiebreaks ⇒ ss03's surviving candidates keep their relative
    // order in the tombstoned ranking (promotions only append/interleave
    // below equal-cos ties, which both sides break identically)
    val base = Similarity.ss03AnnIvf(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (q <- Seq(100L, 200L, 300L, 400L)) {
      val alive = base.filter(x => x._1 == q && x._2 % 9 != 0)
        .sortBy(_._3).map(_._2)
      val ranked = got.filter(_._1 == q).sortBy(_._3).map(_._2)
      // `alive` must be a subsequence of `ranked`
      val it = ranked.iterator
      assert(alive.forall(c => it.contains(c)),
        s"q=$q alive=${alive.toSeq} ranked=${ranked.toSeq}")
    }
  }

  test("ds22: repair sends every straddling dup pair entirely to train") {
    val repair = Curation.ds22SplitRepair(spark, dir01).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    val straddling = Curation.dc05SplitLeakage(spark, dir01)
      .filter(org.apache.spark.sql.functions.col("straddles")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(straddling.nonEmpty)
    for ((d1, d2) <- straddling) {
      assert(repair(d1)._2 == "train" && repair(d2)._2 == "train")
    }
    // moved ⟺ (in a straddling pair ∧ not already train); nothing else moves
    val members = straddling.flatMap(p => Seq(p._1, p._2)).toSet
    for ((d, (old, nw, moved)) <- repair) {
      assert(moved == (members(d) && old != "train"))
      if (!moved) assert(nw == old)
    }
  }

  test("ss35: tombstone recall is a sane fraction over the alive truth") {
    val r = Similarity.ss35TombstoneRecall(spark, dir01).collect()
    assert(r.length == 1)
    val (nExact, nHit, pct) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nExact == 40L) // 4 alive queries × top-10 over the alive corpus
    assert(nHit >= 0 && nHit <= nExact)
    assert(pct == nHit * 100 / nExact)
  }

  test("mv09: signed-delta roll-forward equals recompute over survivors") {
    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val survivors = docs.filter(_._1 % 10 != 7)
    val expect = survivors.groupBy(_._2).map { case (lang, g) =>
      (lang, (g.size.toLong, g.map(_._3).sum,
        g.map(d => d._4.split(' ').count(_.nonEmpty).toLong).sum))
    }
    val got = MatView.mv09ZsetRollforward(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
  }

  test("geo08: stencil sums match a brute Scala 3x3 convolution") {
    val cells = graft.Tables(spark, dir01, "customer")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .map(k => ((k * 37) % 1024 / 32, (k * 91) % 1024 / 32))
      .groupBy(identity).map { case (c, g) => (c, g.size.toLong) }
    val expect = cells.map { case ((cx, cy), n) =>
      val nbrs = for {
        dx <- -1L to 1L; dy <- -1L to 1L
        tx = cx + dx; ty = cy + dy
        if tx >= 0 && tx < 32 && ty >= 0 && ty < 32
      } yield cells.getOrElse((tx, ty), 0L)
      ((cx, cy), (n, nbrs.sum, nbrs.size.toLong))
    }
    val got = Geo.geo08StencilSmooth(spark, dir01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
  }

  test("cc19: projection matches a brute Scala shared-customer count") {
    import org.apache.spark.sql.functions.col
    val cs = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .selectExpr("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCust = cs.groupBy(_._1).map { case (c, g) => (c, g.map(_._2).toSeq) }
      .filter(_._2.size <= 16)
    val expect = byCust.values.toSeq.flatMap { supps =>
      for (a <- supps; b <- supps if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 >= 2)
    val got = Dedup.cc19BipartiteProjection(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("tx26: zipf sums match a Scala recompute; slope is negative") {
    val toks = graft.Tables(spark, dir, "documents")
      .selectExpr("text").collect()
      .flatMap(_.getString(0).split(' ').filter(_.nonEmpty))
    val top = toks.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(1000)
    val terms = top.zipWithIndex.map { case ((_, n), i) =>
      val x = math.log(i + 1.0); val y = math.log(n.toDouble)
      (math.round(x * 10000), math.round(y * 10000),
        math.round(x * y * 10000), math.round(x * x * 10000))
    }
    val (sx, sy, sxy, sxx) = (terms.map(_._1).sum, terms.map(_._2).sum,
      terms.map(_._3).sum, terms.map(_._4).sum)
    val nT = terms.size.toLong
    val r = TextOps.tx26ZipfFit(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((nT, sx, sy, sxy, sxx)))
    assert(r.getLong(5) == nT * sxy * 10000 - sx * sy)
    assert(r.getLong(6) == nT * sxx * 10000 - sx * sx)
    assert(r.getLong(5) < 0 && r.getLong(6) > 0) // frequency falls with rank
  }

  test("q63: median/MAD/fence match a Scala order-statistics recompute") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val qs = graft.Tables(spark, dir, "lineitem")
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    val expect = qs.groupBy(_._1).map { case (f, g) =>
      val vs = g.map(_._2).toSeq
      val med = medianOf(vs)
      val dvs = vs.map(v => math.abs(v - med))
      val mad = medianOf(dvs)
      (f, (vs.size.toLong, med, mad, dvs.count(_ > 3 * mad).toLong))
    }
    val got = Relational.q63RobustOutliers(spark, dir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expect)
  }

  test("mm08: planted duplicate video collides; a one-frame edit does not") {
    import spark.implicits._
    import Multimodal.{MediaRow, encodeRawVideo, syntheticFrames}
    val (w, h) = (20, 16)
    val frames = syntheticFrames(7L, w, h, 6)
    val edited = frames.map(_.clone)
    edited(3)(5) = (edited(3)(5) + 120).toByte // flip one pixel hard
    val media = Seq(
      MediaRow(1L, "video", encodeRawVideo(w, h, frames), w, h, 3),
      MediaRow(2L, "video", encodeRawVideo(w, h, frames), w, h, 3), // dup of 1
      MediaRow(3L, "video", encodeRawVideo(w, h, edited), w, h, 3), // near-miss
      MediaRow(4L, "video",
        encodeRawVideo(w, h, syntheticFrames(9L, w, h, 6)), w, h, 3))
      .toDS()
    val got = Multimodal.videoSignatureDedup(
        Multimodal.videoFrameHashes(media).toDF()).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getBoolean(5)))).toMap
    assert(got(1L) == ((1L, false)) && got(2L) == ((1L, true)))
    assert(!got(3L)._2 && !got(4L)._2)
    // the edit flipped at least one frame hash, else the spec is vacuous
    val fh = Multimodal.videoFrameHashes(media).collect()
      .groupBy(_.media_id).map { case (k, v) =>
        (k, v.sortBy(_.frame_idx).map(_.fhash).toSeq) }
    assert(fh(1L) != fh(3L) && fh(1L) == fh(2L))
  }

  test("plan shapes: new operators keep their scale-critical plans") {
    import org.apache.spark.sql.functions.col
    // dd24: no nested-loop/cartesian anywhere in the excision pipeline
    val dd24 = Curation.dd24SpanExcision(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!dd24.contains("BroadcastNestedLoopJoin") &&
      !dd24.contains("CartesianProduct"), dd24.take(1200))
    // q62: exactly ONE exchange feeds the trigram window (both LEADs ride
    // one user-keyed sort), plus the aggregate's own partial exchange
    val q62 = EventOps.q62EventPaths(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q62.sliding("WindowExec".length).count(_ == "WindowExec") >= 1 ||
      q62.contains("Window"), q62.take(600))
    assert(!q62.contains("CartesianProduct"), q62.take(1200))
    // geo08: the stencil never joins points — only cell-level equi-joins
    val g8 = Geo.geo08StencilSmooth(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!g8.contains("BroadcastNestedLoopJoin") &&
      !g8.contains("CartesianProduct"), g8.take(1200))
    // mv07: the roll-forward plan reads the state parquet and joins only
    // delta-sized sides broadcast — no shuffle join of orders×customer
    val mv7 = MatView.mv07JoinRollforward(spark, dir)
      .queryExecution.executedPlan.toString
    assert(mv7.contains("BroadcastHashJoin"), mv7.take(1200))
    // ds22: repair is broadcast-or-hash equi-joins over the tiny leak list
    val d22 = Curation.ds22SplitRepair(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!d22.contains("CartesianProduct"), d22.take(1200))
  }

  test("geo07: clusters match union-find over brute-counted dense cells") {
    val pts = graft.Tables(spark, dir01, "customer")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .map(k => ((k * 37) % 1024, (k * 91) % 1024))
    val cells = pts.groupBy { case (x, y) => (x / 32, y / 32) }
      .map { case (c, g) => (c, g.size.toLong) }.filter(_._2 >= 3)
    val ids = cells.keys.map { case (cx, cy) => ((cx, cy), cx * 1024 + cy) }.toMap
    val parent = collection.mutable.Map[Long, Long](ids.values.map(i => (i, i)).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (((cx, cy), a) <- ids; dx <- -1L to 1L; dy <- -1L to 1L
         if (dx, dy) != ((0L, 0L));
         b <- ids.get((cx + dx, cy + dy))) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = cells.map { case (c, n) =>
      (c, (n, find(ids(c)))) }
    val got = Geo.geo07DensityClusters(spark, dir01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect)
    // non-trivial structure: several clusters, at least one multi-cell
    val cs = got.values.groupBy(_._2).map(_._2.size)
    assert(cs.max > 1 && cs.size > 1)
  }
}
