package graft.operators

import graft.SparkSpec

/** Fifteenth-stint operators, each verified by independent in-test
  * recomputation (never by re-running the operator's own plan):
  *  - tx23 BM25 retrieval vs a Scala reimplementation of the scoring
  *  - tx24 fertility vs per-doc regex recounts
  *  - cc16 modularity vs a Scala label-prop + modularity recompute, plus
  *    the graph-theoretic invariants (Σ d_tot = 2m, Σ l_intra ≤ m)
  *  - geo06 point-in-polygon vs a brute Scala ray-cast
  *  - mv06 SCD2 roll-forward vs a full 4-snapshot islands rebuild
  * plus the plan shapes that must survive refactors.
  */
class StintFifteenSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq

  test("tx23: matches a Scala reimplementation of BM25 top-10") {
    val got = TextOps.tx23Bm25(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (r.getInt(2), r.getLong(3), r.getLong(4)))).toMap

    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) => toks(t).map((id, _)) }
      .groupBy(identity).map { case ((id, tok), g) => ((id, tok), g.size.toLong) }
    val dl = tf.groupBy(_._1._1).map { case (id, g) => (id, g.values.sum) }
    val df = tf.groupBy(_._1._2).map { case (tok, g) => (tok, g.size.toLong) }
    val n = dl.size.toLong
    val sumDl = dl.values.sum
    val expect = TextOps.bm25Queries.flatMap { case (qid, terms) =>
      val scored = dl.keys.toSeq.flatMap { id =>
        val cs = terms.flatMap { t =>
          tf.get((id, t)).map { f =>
            val idf = math.log((n + 1.0) / (df(t) + 1.0))
            val norm = f * 2.2 /
              (f + 1.2 * (0.25 + 0.75 * dl(id).toDouble * n / sumDl))
            math.round(idf * norm * 10000)
          }
        }
        if (cs.isEmpty) None else Some((id, cs.size.toLong, cs.sum))
      }
      scored.sortBy { case (id, _, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, nh, s), i) => ((qid, id), (i + 1, nh, s)) }
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty && got.keys.map(_._1).toSet == Set(1, 2, 3, 4))
  }

  test("tx23: per-query top-k is a rank-limit pushdown, not a global sort") {
    val plan = TextOps.tx23Bm25(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
    assert(!plan.contains("GlobalLimit"), plan.take(1500))
  }

  test("tx24: fertility sums and ratios match per-doc recounts") {
    val got = TextOps.tx24Fertility(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (lang, g) =>
      val ws = g.map(d => d._2.split(' ').count(_.nonEmpty).toLong).sum
      val bpe = g.map(d => re.findAllIn(d._2.toLowerCase).size.toLong).sum
      val ch = g.map(_._3).sum
      (lang, (g.size.toLong, ws, bpe, ch, bpe * 1000 / ws, ch * 1000 / bpe))
    }
    assert(got == expect)
    assert(got.keySet.size >= 4)
  }

  test("cc16: matches a Scala label-prop + modularity recompute; invariants hold") {
    val got = Dedup.cc16Modularity(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    val dup = Dedup.dd05JaccardVerify(spark, dir).collect()
      .filter(_.getBoolean(4)).map(r => (r.getLong(0), r.getLong(1)))
    val sym = dup ++ dup.map(_.swap)
    val adj = sym.groupBy(_._1).map { case (k, g) => (k, g.map(_._2)) }
    var lab = adj.keys.map(k => (k, k)).toMap
    for (_ <- 1 to 3)
      lab = lab.map { case (k, l) =>
        (k, math.min(l, adj(k).map(lab).min))
      }
    val m = dup.length.toLong
    val deg = sym.groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val expect = lab.groupBy(_._2).map { case (label, members) =>
      val nodes = members.keys.toSet
      val dTot = nodes.toSeq.map(deg).sum
      val lIntra = dup.count { case (a, b) =>
        lab(a) == label && lab(b) == label }.toLong
      (label, (nodes.size.toLong, lIntra, dTot,
        4 * m * lIntra - dTot * dTot, 4 * m * m))
    }
    assert(got == expect)
    // graph-theoretic invariants of any partition
    assert(got.values.map(_._3).sum == 2 * m, "sum of degrees must be 2m")
    assert(got.values.map(_._2).sum <= m, "intra edges can't exceed m")
    assert(got.nonEmpty)
  }

  test("geo06: matches a brute Scala ray-cast; all polys hit; zero shuffles") {
    val q = Geo.geo06PointInPolygon(spark, dir)
    val got = q.collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap

    val pts = graft.Tables(spark, dir, "customer")
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .map(k => (k, k * 37 % 1024, k * 91 % 1024))
    val expect = (for {
      (pid, verts) <- Geo.polygons
      (id, px, py) <- pts
    } yield {
      val nCross = verts.indices.count { i =>
        val (x1, y1) = verts(i)
        val (x2, y2) = verts((i + 1) % verts.size)
        val t = (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)
        ((y1 > py) != (y2 > py)) && (if (y2 > y1) t < 0 else t > 0)
      }
      ((id, pid), nCross)
    }).filter(_._2 % 2 == 1).toMap
    assert(got == expect)
    // every polygon contains at least one point (fixture is meaningful)
    assert(Geo.polygons.map(_._1).toSet == got.keys.map(_._2).toSet)
    // containment is a pure projection: no exchange anywhere
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      q.queryExecution.executedPlan.toString.take(1500))
  }

  test("ss29/ss30: projection matches a Scala JL recompute; encode has no shuffle") {
    val enc = Similarity.ss29RpEncode(spark, dir)
    // ss29 emits LONG FORM (vec_id, p, c) since the driver-hashability
    // re-shape (round 6) — reassemble the per-vector projection by p
    val got = enc.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    // independent recompute: the same md5-parity ±1 planes, from scratch
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, d: Int): Long = {
      md.reset()
      val dig = md.digest(s"$p:${d + 1}".getBytes("UTF-8"))
      (((((dig(0) >> 4) & 0xf) % 2) * 2) - 1).toLong
    }
    val vecs = graft.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(x * 1000) as bigint)) v")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val expect = vecs.map { case (id, v) =>
      (id, (0 until 32).map(p =>
        v.indices.map(d => v(d) * sign(p, d)).sum))
    }.toMap
    assert(got.view.mapValues(_.toSeq).toMap ==
      expect.view.mapValues(_.toSeq).toMap)
    // encode is a pure projection over the scan — no KEYED shuffle and no
    // sort anywhere (Tables' round-robin read-balance exchange is fine)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan.take(1200))
    assert(!plan.contains("Sort "), plan.take(1200))

    // ss30's projected ranking agrees with a brute recompute in RP space
    val topk = Similarity.ss30RpTopk(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(2)), r.getLong(1))).toMap
    val ids = expect.keys.toSeq
    val pn = expect.view.mapValues(rp => rp.map(x => x * x).sum).toMap
    for (q <- ids.filter(_ % 100 == 0)) {
      val want = ids.filter(_ != q).map { c =>
        val pdot = (0 until 32).map(i => expect(q)(i) * expect(c)(i)).sum
        val pcos = pdot / math.sqrt(pn(q).toDouble * pn(c).toDouble)
        (c, pcos)
      }.sortBy { case (c, pc) => (-pc, c) }.take(10)
      want.zipWithIndex.foreach { case ((c, _), i) =>
        assert(topk((q, i + 1)) == c, s"q=$q rank ${i + 1}")
      }
    }
  }

  test("dd22: spans match a brute Scala extraction and are maximal") {
    val got = Curation.dd22SharedSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map { r =>
        val toksArr = r.getString(1).toLowerCase
          .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
          .split(' ').filter(_.nonEmpty)
        (r.getLong(0), toksArr.sliding(8).map(_.mkString(" ")).toArray)
      }
    // gram -> list of (doc, 1-based pos); keep grams in 2..16 docs
    val postings = docs.flatMap { case (id, grams) =>
      grams.zipWithIndex.map { case (g, i) => (g, id, i + 1L) } }
      .groupBy(_._1)
      .filter { case (_, hits) =>
        val nd = hits.map(_._2).distinct.size; nd >= 2 && nd <= 16 }
    val pairHits = postings.values.flatMap { hits0 =>
      val hits = hits0.toList
      for (a <- hits; b <- hits if a._2 < b._2)
        yield ((a._2, b._2, a._3 - b._3), a._3)
    }.toSeq.groupBy(_._1)
    val expect = pairHits.flatMap { case ((da, db, diff), g) =>
      val ps = g.map(_._2).distinct.sorted
      // islands over consecutive positions
      val runs = ps.foldLeft(List.empty[List[Long]]) {
        case ((h @ (hd :: _)) :: t, p) if p == hd + 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }
      runs.map { run =>
        val start = run.min
        (da, db, start, start - diff, run.size + 7L)
      }
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // maximality: no two spans of the same pair+alignment are adjacent
    got.groupBy(s => (s._1, s._2, s._3 - s._4)).values.foreach { spans =>
      val sorted = spans.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(x, y) =>
          assert(y._3 > x._3 + (x._5 - 7), s"mergeable spans: $x $y")
        case _ =>
      }
    }
  }

  test("ss32: scores are the ss29 projections' exact dots; ranks well-formed") {
    val enc = Similarity.ss29RpEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val pn = enc.view.mapValues(rp => rp.map(x => x * x).sum).toMap
    val rows = Similarity.ss32IvfRp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, c, _, pdot, pcos) =>
      val want = enc(q).indices.map(i => enc(q)(i) * enc(c)(i)).sum
      assert(pdot == want, s"($q,$c)")
      assert(pcos == pdot / math.sqrt(pn(q).toDouble * pn(c).toDouble))
    }
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to g.size))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y._5 < x._5 || (y._5 == x._5 && y._2 > x._2),
            s"rank order broken at q=${x._1}")
        case _ =>
      }
    }
  }

  test("dd22/ss32: pair builds never cartesian; dd22 has no nested-loop at all") {
    val dd22Plan = Curation.dd22SharedSpans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!dd22Plan.contains("BroadcastNestedLoopJoin"), dd22Plan.take(1200))
    assert(!dd22Plan.contains("CartesianProduct"), dd22Plan.take(1200))
    // ss32's only nested-loop is the DELIBERATE broadcast-cross against the
    // k-row centroid set (ss03's assignment pattern); a non-broadcast
    // cartesian anywhere would be corpus x corpus and must never appear
    val ss32Plan = Similarity.ss32IvfRp(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!ss32Plan.contains("CartesianProduct"), ss32Plan.take(1200))
  }

  test("ingest gate stream: micro-batched output equals the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(40)
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getString(4))).toSet
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStream.ingestGateStream(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate15")
      .outputMode("append").start()
    try {
      input.addData(docs.take(20).toSeq: _*)
      q.processAllAvailable()
      input.addData(docs.drop(20).toSeq: _*)
      q.processAllAvailable()
      val got = shape(spark.table("gate15").collect())
      val batch = shape(graft.streaming.EventStream.ingestGateStream(
        docs.toSeq.toDF("doc_id", "text")).collect())
      assert(got == batch)
      // the gate actually decides something on this corpus
      assert(got.exists(_._4) && got.exists(!_._4))
      assert(got.map(_._2).size >= 1)
    } finally q.stop()
  }

  test("mv06: roll-forward equals a full 4-snapshot islands rebuild") {
    val got = MatView.mv06Scd2Rollforward(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]))).toSet

    val cust = graft.Tables(spark, dir, "customer")
      .selectExpr("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expect = cust.flatMap { case (k, b1) =>
      val b2 = if (k % 7 == 0) b1 + 100.0 else b1
      val b3 = if (k % 3 == 0) b2 + 50.0 else b2
      val b4 = if (k % 2 == 0) b3 + 25.0 else b3
      val snaps = Seq(
        (1, b1, k % 5 != 0), (2, b2, true),
        (3, b3, k % 11 != 0), (4, b4, k % 13 != 0))
        .collect { case (v, b, present) if present => (v, b) }
      // islands: break on version gap or value change
      val segs = snaps.foldLeft(List.empty[List[(Int, Double)]]) {
        case (acc, (v, b)) => acc match {
          case (h @ ((pv, pb) :: _)) :: t if pv == v - 1 && pb == b =>
            ((v, b) :: h) :: t
          case _ => List((v, b)) :: acc
        }
      }
      segs.map { seg =>
        val vers = seg.map(_._1)
        (k, seg.head._2, vers.min,
          if (vers.max == 4) None else Some(vers.max + 1))
      }
    }.toSet
    assert(got == expect)
    // the fixture exercises every transition: unchanged, changed, deleted,
    // re-inserted
    assert(got.exists(_._4.contains(4)), "some interval must close at v4")
    assert(got.exists(r => r._3 == 4 && r._4.isEmpty), "some interval must open at v4")
  }
}
