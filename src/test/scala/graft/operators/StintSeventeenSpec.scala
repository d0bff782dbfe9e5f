package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seventeenth-stint operators, each verified by independent in-test
  * recomputation (never by re-running the operator's own plan):
  *  - Relational.trussEdges vs a brute Scala peel on hand graphs (incl.
  *    a cascade) and on the real co-purchase graph at sf0.001
  *  - q64 interpolation vs a brute per-user Scala lerp
  *  - ds23 bucket law (every doc's bucket is the tightest power of two)
  *  - dd25 cosine verdicts vs brute full-vector dots in Scala
  *  - tx27 deletion-neighborhood completeness vs brute-force Levenshtein
  *  - mv10 bounded-synopsis min/max with a FORCED rescan hole
  */
class StintSeventeenSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  // -- brute k-truss peel on an in-memory edge list ---------------------
  private def brutePeel(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = edges
    var changed = true
    while (changed) {
      val adj = e.flatMap(p => Seq(p, (p._2, p._1)))
        .groupBy(_._1).map { case (n, s) => (n, s.map(_._2)) }
      val sup = e.map { case (a, b) =>
        ((a, b), (adj.getOrElse(a, Set.empty).toSet &
          adj.getOrElse(b, Set.empty).toSet).size)
      }.toMap
      val e2 = e.filter(p => sup(p) >= k - 2)
      changed = e2 != e
      e = e2
    }
    e
  }

  private def trussOf(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Relational.trussEdges(edges.toDF("a", "b"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("trussEdges matches a brute peel on hand graphs, incl. a cascade") {
    // two 4-cliques sharing an edge + a pendant triangle off node 3:
    // k=4 keeps both cliques, peels the triangle.
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c2 = Seq((3L, 5L), (4L, 5L), (3L, 6L), (4L, 6L), (5L, 6L)) // 3-4-5-6 clique (3,4 shared)
    val tri = Seq((3L, 7L), (7L, 8L), (3L, 8L))
    val g = c1 ++ c2 ++ tri
    assert(trussOf(g, 4) === brutePeel(g.toSet, 4))
    assert(trussOf(g, 4) === (c1 ++ c2).toSet)
    // cascade: a strip of triangles sharing edges — 1-2-3, 2-3-4, 3-4-5, …
    // every interior edge has support 2 until the END triangle dies, then
    // the peel propagates down the strip round by round; k=4 empties it.
    val strip = (1L to 8L).flatMap(i => Seq((i, i + 1), (i, i + 2))).filter(_._2 <= 9L)
    assert(trussOf(strip, 4) === brutePeel(strip.toSet, 4))
    assert(trussOf(strip, 4) === Set.empty)
    // and k=3 (support ≥ 1) keeps the whole strip
    assert(trussOf(strip, 3) === brutePeel(strip.toSet, 3))
  }

  test("cc20 equals the brute peel on the real co-purchase graph") {
    val l = graft.Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val e0 = l.as("x").join(l.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.cc20Ktruss(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brutePeel(e0, 10))
  }

  test("q64 lerp matches a brute per-user interpolation") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("e"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)) // (e, event_id)
      val es = sorted.map(_._3)
      val gs = (es.min + 3599) / 3600 * 3600
      val ge = es.max / 3600 * 3600
      (gs to ge by 3600).map { g =>
        val prev = sorted.filter(_._3 <= g).last // max (e, event_id) ≤ g
        val (num, den) =
          if (prev._3 == g) (prev._4, 1L)
          else {
            val next = sorted.find(_._3 > g).get // min (e, event_id) > g
            (prev._4 * (next._3 - g) + next._4 * (g - prev._3), next._3 - prev._3)
          }
        ((u, g), (num, den))
      }
    }
    val got = EventOps.q64InterpResample(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }

  test("ds23 bucket is the tightest power of two for every doc") {
    val docs = graft.Tables(spark, dir, "documents")
    val perDoc = docs.select(
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    def pow2(n: Long): Long = { var b = 1L; while (b < n) b *= 2; math.max(b, 1L) }
    val wantBuckets = perDoc.groupBy(pow2)
      .map { case (b, ns) => (b, (ns.length.toLong, ns.sum)) }
    val got = Curation.ds23LengthBuckets(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === wantBuckets)
    // padded ≥ real tokens, waste < 50% per bucket (power-of-two promise)
    Curation.ds23LengthBuckets(spark, dir).collect().foreach { r =>
      assert(r.getLong(3) >= r.getLong(2))
      assert(r.getDouble(5) < 0.5 || r.getLong(0) == 1L)
    }
  }

  test("dd25 verdicts equal brute full-vector cosine on candidate pairs") {
    val rows = Dedup.dd25CosinePairs(spark, dir).collect()
    // independent shingle-count vectors straight from the text
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def vec(id: Long): Map[String, Long] = {
      val tk = docs(id).split(" ", -1)
      (0 until math.max(tk.length - 2, 0))
        .map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}")
        .groupBy(identity).map { case (s, o) => (s, o.length.toLong) }
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      val (v1, v2) = (vec(d1), vec(d2))
      val dot = v1.keysIterator.map(k => v1(k) * v2.getOrElse(k, 0L)).sum
      val (n2a, n2b) = (v1.values.map(x => x * x).sum, v2.values.map(x => x * x).sum)
      assert(r.getLong(2) === dot, s"dot for ($d1,$d2)")
      assert(r.getLong(3) === n2a && r.getLong(4) === n2b)
      assert(r.getBoolean(5) === (25 * dot * dot >= 9 * n2a * n2b))
    }
  }

  test("tx27 finds EXACTLY the brute-force edit-distance-1 pairs") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = graft.Tables(spark, dir, "customer")
      .select(col("c_name")).distinct().collect().map(_.getString(0))
    val want = (for {
      i <- vocab.indices; j <- vocab.indices
      if vocab(i) < vocab(j) && lev(vocab(i), vocab(j)) <= 1
    } yield (vocab(i), vocab(j))).toSet
    val got = TextOps.tx27Edit1Pairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q65 trailing-5 slope matches a brute per-user least squares") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("e"),
        expr("cast(floor(value * 1000) as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val e0 = ev.map(_._3).min
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(i - 4, 0), i + 1)
          .map(r => (r._3 - e0, r._4))
        val n = win.length.toLong
        val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
        val sxy = win.map(p => p._1 * p._2).sum
        val sxx = win.map(p => p._1 * p._1).sum
        ((u, sorted(i)._2), (n * sxy - sx * sy, n * sxx - sx * sx))
      }
    }
    val got = EventOps.q65RollingSlope(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }

  test("q66 boundaries are the ceil-rule quartiles of the sorted values") {
    val vals = graft.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, v) => (f, v.map(_._2).sorted) }
    def boundary(sorted: Seq[Long], t: Long): Long = sorted((t - 1).toInt)
    val want = vals.map { case (f, sorted) =>
      val n = sorted.length.toLong
      (f, (n, boundary(sorted, (n + 3) / 4), boundary(sorted, (n + 1) / 2),
        boundary(sorted, (3 * n + 3) / 4)))
    }
    val got = Relational.q66EquidepthHist(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
  }

  test("cc21 PPR equals the brute integer recurrence and stays seed-local") {
    // brute: same recurrence over an in-memory adjacency, sparse maps
    val o = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val l = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = l.groupBy(_._1)
    val e0 = o.flatMap { case (c, ok) =>
      byOrder.getOrElse(ok, Array.empty[(Long, Long)])
        .map(x => (c, 10000000L + x._2))
    }.distinct
    val edges = (e0 ++ e0.map(p => (p._2, p._1))).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val seeds = o.map(_._1).distinct.sorted.take(3)
    var pr: Map[Long, Long] = seeds.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      pr.foreach { case (u, p) =>
        val out = adj(u); out.foreach(v => contrib(v) += p / out.length)
      }
      val damped = contrib.map { case (v, c) => (v, 85L * c / 100L) }
      pr = (seeds.map(_ -> 150000000L) ++ damped.toSeq)
        .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    }
    val got = Dedup.cc21Ppr(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === pr)
    // locality: after ONE iteration the support is the seeds' 1-ball, a
    // strict subset of the node set (3 rounds close this small graph)
    import spark.implicits._
    val oneHop = Relational.personalizedPageRank(
      edges.toSeq.toDF("src", "dst"), seeds.toSeq.toDF("node"), iters = 1)
    assert(oneHop.count() < adj.size)
  }

  test("ds24 shards are contiguous equal splits of the sort order with tight fences") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._3, r._1))
    val n = docs.length
    val (q, r0) = (n / 8, n % 8)
    val brute = docs.zipWithIndex.map { case (d, i) =>
      val pos = i + 1
      val shard = if (pos <= r0 * (q + 1)) (pos - 1) / (q + 1) + 1
        else r0 + (pos - r0 * (q + 1) - 1) / q + 1
      (shard.toLong, d)
    }.groupBy(_._1)
    val want = brute.map { case (sh, rows) =>
      val ds = rows.map(_._2)
      (sh, (ds.length.toLong, ds.map(_._2).min, ds.map(_._2).max,
        ds.map(_._3).min, ds.map(_._3).max))
    }
    val got = Curation.ds24ZoneMaps(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
    // equal split: sizes differ by at most one
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
    // lang fences never move backward across shards (the 1st sort key is
    // genuinely zoned; chars ranges may overlap where a lang boundary
    // crosses a shard — equality to the brute grouping above already
    // proves position-contiguity)
    (1L until 8L).foreach { i =>
      assert(got(i)._3 <= got(i + 1)._2, s"shards $i,${i + 1}")
    }
  }

  test("q67 drawdown equals the brute running-peak scan") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("e"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var peak = Long.MinValue
      val scanned = sorted.map { r => peak = math.max(peak, r._4); (r, peak) }
      val best = scanned.maxBy { case (r, p) => (p - r._4, -r._3, -r._2) }
      (u, (best._2 - best._1._4, best._1._2, best._2))
    }
    val got = EventOps.q67Drawdown(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }

  test("q68 credits are conserved per purchase and match the brute split") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("e"),
        col("event_type"), expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val touches = ev.filter(r => r._4 == "view" || r._4 == "click")
    val want = ev.filter(_._4 == "purchase").flatMap { p =>
      val ts = touches.filter(t => t._2 == p._2 && t._3 <= p._3 && t._3 >= p._3 - 1800)
      if (ts.isEmpty) Seq.empty[((Long, Long), Long)]
      else {
        val n = ts.length
        val first = ts.minBy(t => (t._3, t._1))
        ts.toSeq.map(t => ((p._1, t._1),
          p._5 / n + (if (t == first) p._5 % n else 0L)))
      }
    }.toMap
    val got = EventOps.q68Multitouch(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(got === want)
    // conservation: per-purchase credits sum exactly to the value
    val byP = got.toSeq.groupBy(_._1._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val vals = ev.filter(_._4 == "purchase").map(p => (p._1, p._5)).toMap
    byP.foreach { case (p, s) => assert(s === vals(p), s"purchase $p") }
    assert(byP.nonEmpty)
  }

  test("q69 cells equal the brute chi-square table, zero cells included") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val rM = docs.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val cM = docs.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
    val oM = docs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val want = (for { l <- rM.keys; s <- cM.keys } yield {
      val o = oM.getOrElse((l, s), 0L)
      val d = o * n - rM(l) * cM(s)
      ((l, s), (o, d, 1000L * d * d / (rM(l) * cM(s) * n)))
    }).toMap
    val got = Curation.q69ChisqDrift(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(6), r.getLong(7)))).toMap
    assert(got === want)
    // the frame is the full cross product — zero cells present iff any
    assert(got.size === rM.size * cM.size)
  }

  test("mm09 spans tile [0, n_frames) exactly, F from the real WAV decode") {
    val rows = Multimodal.mm09TranscriptAlign(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, ts) =>
      val sorted = ts.sortBy(_._2)
      // starts at 0, ends at the clip's frame count from the WAV fixture
      assert(sorted.head._3 === 0L, s"doc $id")
      assert(sorted.last._4 === (2048 + id % 1024) / 256, s"doc $id")
      // consecutive spans touch: end_i == start_{i+1} (no gap, no overlap)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === b._3, s"doc $id idx ${a._2}")
        case _ =>
      }
    }
    // only audio-kind docs are aligned
    assert(rows.map(_._1).distinct.forall(id => ((id % 3) + 3) % 3 == 1))
  }

  test("q70 bitmap intersection equals brute user-set intersection") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = ev.groupBy(_._1).map { case (t, v) => (t, v.map(_._2).toSet) }
    val types = sets.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- types.indices
      if types(i) < types(j)
      n = (sets(types(i)) & sets(types(j))).size.toLong
      if n > 0
    } yield ((types(i), types(j)), n)).toMap
    val got = EventOps.q70AudienceOverlap(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q71 residuals sum to zero within every (user, hour) group") {
    val rows = EventOps.q71SeasonalResidual(spark, dir)
      .collect().map(r => ((r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, g) =>
      // Σ resid_num = Σ (v·cnt − sum) = cnt·sum − |g|·sum = 0 when |g| = cnt
      assert(g.map(_._2._4).sum === 0L, s"group $k")
      assert(g.length.toLong === g.head._2._3, s"group $k count")
      // and each residual is exactly v·cnt − sum
      g.foreach { case (_, (v, sv, c, rn)) => assert(rn === v * c - sv) }
    }
  }

  test("ds25 releases only rows whose crowd reaches k at the served level") {
    val rows = Curation.ds25KAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getString(7)))
    assert(rows.nonEmpty)
    val k = 5L
    rows.foreach { case (id, _, seg, n0, n1, level, released, out) =>
      level match {
        case 0L => assert(n0 >= k && released && out == seg, s"row $id")
        case 1L => assert(n0 < k && n1 >= k && released && out == "*", s"row $id")
        case 2L => assert(n0 < k && n1 < k && !released && out == "*", s"row $id")
      }
    }
    // crowd sizes are honest: recount level-0 groups independently
    val recount = rows.groupBy(r => (r._2, r._3)).map { case (g, v) => (g, v.length.toLong) }
    rows.foreach { r => assert(r._4 === recount((r._2, r._3)), s"n0 of ${r._1}") }
  }

  test("q72 deltas equal the brute hourly series") {
    val ev = graft.Tables(spark, dir, "events")
      .select(unix_timestamp(col("ts")).as("e"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0) / 3600 * 3600, r.getLong(1)))
    val hourly = ev.groupBy(_._1).map { case (h, v) => (h, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val want = hourly.zipWithIndex.map { case ((h, cur), i) =>
      val prev = if (i == 0) None else Some(hourly(i - 1)._2)
      (h, (cur, prev, prev.map(cur - _)))
    }.toMap
    val got = EventOps.q72PeriodOverPeriod(spark, dir)
      .collect().map { r =>
        (r.getLong(0), (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap
    assert(got === want)
  }

  test("tx28 lcp(min,max) equals the brute all-docs common prefix") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def lcp2(a: String, b: String): Int = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i
    }
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val texts = rows.map(_._2)
      (src, (texts.length.toLong,
        texts.reduce((a, b) => a.take(lcp2(a, b))).length.toLong))
    }
    val got = TextOps.tx28BoilerplatePrefix(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("dd26 winnowing fingerprints and pairs match a brute recompute") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val fps = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val hs = (0 until math.max(tk.length - 2, 0))
        .map(i => md5Long(s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}"))
      val mins = (3 until hs.length).map(i => hs.slice(i - 3, i + 1).min)
      (id, mins.toSet)
    }.toMap
    val dfAll = fps.values.flatten.groupBy(identity).map { case (f, o) => (f, o.size) }
    val keep = dfAll.filter { case (_, c) => c >= 2 && c <= 20 }.keySet
    val ids = fps.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      shared = (fps(ids(i)) & fps(ids(j))).count(keep)
      if shared >= 2
    } yield ((ids(i), ids(j)), shared.toLong)).toMap
    val got = Dedup.dd26Winnowing(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q73 merged spans equal a brute sweep") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val iv = rows.map(r => (r._2, r._2 + 300L)).sortBy(_._1)
      var spans = List.empty[(Long, Long)]
      iv.foreach { case (s0, e0) =>
        spans match {
          case (a, b) :: rest if s0 <= b => spans = (a, math.max(b, e0)) :: rest
          case _ => spans = (s0, e0) :: spans
        }
      }
      (u, (spans.length.toLong, spans.map(p => p._2 - p._1).sum))
    }
    val got = EventOps.q73IntervalMerge(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("tp11 provenance card never contradicts its constituent operators") {
    val card = Curation.tp11DocProvenance(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getBoolean(3), r.getBoolean(4),
        Option(r.getString(5)), r.getString(6)))).toMap
    // covers every raw doc exactly once
    val all = graft.Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(card.keySet === all)
    // exact-survivor flags equal dd01's keep set
    val keep = Dedup.dd01ExactDedup(spark, dir).select("keep_id")
      .collect().map(_.getLong(0)).toSet
    card.foreach { case (id, (surv, _, _, _)) => assert(surv === keep(id), s"doc $id") }
    // curated membership + split equal tp02's output
    val cur = Curation.tp02FullCuration(spark, dir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    card.foreach { case (id, (_, inCur, spl, _)) =>
      assert(inCur === cur.contains(id), s"doc $id")
      assert(spl === cur.get(id), s"doc $id")
    }
    // a doc outside the curated corpus can still carry its hash split
    assert(card.exists { case (_, (_, inCur, _, hs)) => !inCur && hs.nonEmpty })
  }

  test("cc22 HITS equals the brute integer power iteration") {
    val o = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val l = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = l.flatMap { case (ok, sk) => o.get(ok).map(ck => (ck, sk)) }.distinct
    var h: Map[Long, Long] = e.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to 3) {
      a = e.groupBy(_._2).map { case (d, es) =>
        (d, es.map(x => h(x._1)).sum / 64) }
      h = e.groupBy(_._1).map { case (s0, es) =>
        (s0, es.map(x => a(x._2)).sum / 64) }
    }
    val got = Dedup.cc22Hits(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val want = h.map { case (k, v) => ((k, "hub"), v) } ++
      a.map { case (k, v) => ((k, "authority"), v) }
    assert(got === want)
  }

  test("mv11 top-k synopsis survives deletions and rescans on underflow") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("mv11-spec").toFile
    try {
      // zz: delete 5 of the 6 synopsis rows → survivors(1) < min(3,
      // base_rem(4)) → rescan must surface the EXCLUDED base rows 40/30
      // (ranked 7th/8th in base, outside the stored synopsis).
      val zz = (1 to 10).map(i => ("zz", i.toLong, (i * 10).toLong)) // v: 10..100
      val aa = Seq(("aa", 21L, 500L), ("aa", 22L, 400L), ("aa", 23L, 300L), ("aa", 24L, 200L))
      MatView.topKState((zz ++ aa).toDF("lang", "doc_id", "v"), path.getPath)
      val del = Seq(("zz", 10L), ("zz", 9L), ("zz", 8L), ("zz", 7L), ("zz", 6L),
        ("aa", 21L)).toDF("lang", "doc_id")
      val ins = Seq(("aa", 30L, 450L)).toDF("lang", "doc_id", "v")
      val cur = ((zz.take(5) :+ (("aa", 30L, 450L))) ++ aa.drop(1))
        .toDF("lang", "doc_id", "v")
      val got = MatView.topKRollForward(spark, path.getPath, ins, del, cur)
        .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
      assert(got === Map(
        ("zz", 1) -> ((5L, 50L)), ("zz", 2) -> ((4L, 40L)), ("zz", 3) -> ((3L, 30L)),
        ("aa", 1) -> ((30L, 450L)), ("aa", 2) -> ((22L, 400L)), ("aa", 3) -> ((23L, 300L))))
      // and the driver query equals the direct recompute on real data
      val served = MatView.mv11TopkRollforward(spark, dir).collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
      val want = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
        graft.Tables(spark, dir, "documents").filter(col("doc_id") % 10 =!= 7)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .collect().map(r => ((r.getString(r.fieldIndex("lang")),
            r.getInt(r.fieldIndex("rk"))), r.getLong(r.fieldIndex("doc_id")))).toMap
      }
      assert(served === want)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(path)
  }

  test("ds26 quotas sum to the budget exactly, largest remainders first") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("lang")).collect().map(_.getString(0))
    val n = docs.length.toLong
    val counts = docs.groupBy(identity).map { case (l, v) => (l, v.length.toLong) }
    val base = counts.map { case (l, c) => (l, c * 100 / n) }
    val rem = counts.map { case (l, c) => (l, c * 100 % n) }
    val lo = 100 - base.values.sum
    val winners = rem.toSeq.sortBy { case (l, r) => (-r, l) }.take(lo.toInt).map(_._1).toSet
    val wantQuota = base.map { case (l, b) => (l, b + (if (winners(l)) 1L else 0L)) }
    val got = Curation.ds26QuotaSample(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    val gotQuota = got.groupBy(_._1).map { case (l, v) => (l, v.head._2) }
    assert(gotQuota === wantQuota)
    // the budget is met EXACTLY: one selected row per quota seat
    assert(got.length === 100)
    gotQuota.foreach { case (l, q) =>
      assert(got.count(_._1 == l).toLong === q, s"lang $l") }
  }

  test("geo09 reports each intersecting rectangle pair exactly once") {
    val sup = graft.Tables(spark, dir, "supplier").select(col("s_suppkey"))
      .collect().map(_.getLong(0))
    val part = graft.Tables(spark, dir, "part").select(col("p_partkey"))
      .collect().map(_.getLong(0))
    val want = (for {
      s0 <- sup; p0 <- part
      (ax, ay, ar) = ((s0 * 73) % 1024, (s0 * 137) % 1024, s0 % 16 + 4)
      (bx, by, br) = ((p0 * 91) % 1024, (p0 * 53) % 1024, p0 % 24 + 4)
      if math.abs(ax - bx) <= ar + br && math.abs(ay - by) <= ar + br
    } yield ((s0, p0),
      (math.min(ax + ar, bx + br) - math.max(ax - ar, bx - br)) *
        (math.min(ay + ar, by + br) - math.max(ay - ar, by - br)))).toMap
    val rows = Geo.geo09RectJoin(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4)))
    // exactly once: no reference-point duplicates survive
    assert(rows.length === rows.map(_._1).distinct.length)
    assert(rows.toMap === want)
    assert(rows.nonEmpty)
  }

  test("mv12 merged window equals recompute and never includes expired days") {
    val served = MatView.mv12SlidingRollforward(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.Tables(spark, dir, "events")
      .select(expr("unix_timestamp(ts) div 86400").as("day"), col("event_type"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = ev.map(_._1).max
    val inWin = ev.filter(_._1 > md - 3)
    val want = inWin.groupBy(_._2).map { case (t, rows) =>
      (t, (rows.length.toLong, rows.map(_._3).sum)) }
    assert(served === want)
    // the fixture really spans more days than the window (eviction is real)
    assert(ev.map(_._1).distinct.length > 3)
  }

  test("q74 rules equal the brute basket mining, metrics from exact counts") {
    val items = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = items.map(_._1).distinct.length.toLong
    val ic = items.groupBy(_._2).map { case (i, v) => (i, v.length.toLong) }
    val pairCounts = items.groupBy(_._1).values.flatMap { basket =>
      val is = basket.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
    }.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
      .filter(_._2 >= 3)
    val got = Relational.q74AssocRules(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val want = pairCounts.map { case ((a, b), sab) => ((a, b), (sab, ic(a), ic(b), n)) }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("cc23 stress equals brute path counting on hand graphs and real data") {
    import spark.implicits._
    def bruteStress(edges: Seq[(Long, Long)], seeds: Seq[Long], h: Int): Map[Long, Long] = {
      val adj = (edges ++ edges.map(p => (p._2, p._1))).distinct
        .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }.withDefaultValue(Seq.empty)
      val acc = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (s0 <- seeds) {
        // BFS with sigma
        val dist = collection.mutable.Map(s0 -> 0)
        val sigma = collection.mutable.Map(s0 -> 1L)
        var frontier = Seq(s0)
        var d = 0
        while (frontier.nonEmpty && d < h) {
          val next = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
          frontier.foreach(u => adj(u).foreach { v =>
            if (!dist.contains(v)) next(v) += sigma(u)
          })
          next.foreach { case (v, sg) => dist(v) = d + 1; sigma(v) = sg }
          frontier = next.keys.toSeq
          d += 1
        }
        // backward suffix counts
        val c = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        dist.toSeq.sortBy(-_._2).foreach { case (u, du) =>
          c(u) = adj(u).filter(w => dist.get(w).contains(du + 1))
            .map(w => c(w) + 1).sum
        }
        dist.keys.filter(_ != s0).foreach(v => acc(v) += sigma(v) * c(v))
      }
      acc.filter(_._2 > 0).toMap
    }
    // path graph 1-2-3-4-5, seed 1: node 2 lies on paths to 3,4,5 …
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val gotPath = Relational.stressCentrality(
      (path ++ path.map(p => (p._2, p._1))).toDF("src", "dst"),
      Seq(1L).toDF("node"), horizon = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotPath === Map(2L -> 3L, 3L -> 2L, 4L -> 1L))
    assert(gotPath === bruteStress(path, Seq(1L), 6))
    // diamond 1-2-4, 1-3-4, 4-5: two shortest 1→4 paths, both через 2|3
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val gotDia = Relational.stressCentrality(
      (dia ++ dia.map(p => (p._2, p._1))).toDF("src", "dst"),
      Seq(1L).toDF("node"), horizon = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotDia === bruteStress(dia, Seq(1L), 6))
    assert(gotDia(4L) === 2L) // σ(4)=2 prefixes × the single suffix to 5
    // real data, all four seeds
    val o = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val l = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ie = o.flatMap { case (c, ok) =>
      l.getOrElse(ok, Array.empty[(Long, Long)]).map(x => (c, 10000000L + x._2))
    }.distinct.toSeq
    val seeds = o.map(_._1).distinct.sorted.take(4)
    val want = bruteStress(ie, seeds, 6)
    val got = Dedup.cc23StressCentrality(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("ds27 never lets a near-dup component straddle splits") {
    val rows = Curation.ds27ClusterSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(4)))
    // every component maps to exactly one split
    rows.filter(_._3.nonEmpty).groupBy(_._3.get).foreach { case (c, members) =>
      assert(members.map(_._4).distinct.length === 1, s"component $c straddles")
    }
    // clustered flag is honest vs an independent component recompute
    val comp = Dedup.cc01DupComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (id, clustered, c, _) =>
      assert(clustered === comp.contains(id), s"doc $id")
      assert(c === comp.get(id), s"doc $id")
    }
    // singletons keep ds01's per-content split
    val ds01 = Curation.ds01HashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    rows.filter(!_._2).foreach { case (id, _, _, sp) =>
      assert(sp === ds01(id), s"doc $id") }
  }

  test("q75 shares are consistent ratios of exact cent rollups") {
    val rows = Relational.q75ShareOfParent(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // nations sum to their region; regions sum to the total
    rows.groupBy(_._1).foreach { case (reg, ns) =>
      assert(ns.map(_._3).sum === ns.head._4, s"region $reg")
    }
    assert(rows.groupBy(_._1).map(_._2.head._4).sum === rows.head._5)
  }

  test("mm10 resize conserves luma mass within truncation and is golden-stable") {
    // out_hash is spec-only since round 6 (the registered query projects
    // it out for the fixture-arithmetic oracle) — read the full Dataset
    val rows = Multimodal.resizeImages(
        Multimodal.mediaFromDocuments(spark, dir)).toDF().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, ow, oh, sIn, sOut, _) =>
      assert(ow === (w + 1) / 2 && oh === (h + 1) / 2, s"media $id dims")
      // each output pixel truncates < 1 unit per SOURCE-pixel-share:
      // mean·count ≤ block sum < mean·count + count; summing over blocks,
      // 4·sumOut ≤ ~sumIn bound is loose at edges — use the per-pixel
      // bound: sumOut ≤ sumIn and sumIn < 4·(sumOut + out_pixels)
      assert(sOut * 1L <= sIn, s"media $id mass up")
      assert(sIn < 4L * (sOut + ow.toLong * oh), s"media $id mass down")
    }
    // deterministic: a second run produces identical fingerprints
    val again = Multimodal.resizeImages(
        Multimodal.mediaFromDocuments(spark, dir)).toDF().collect()
      .map(r => (r.getLong(0), r.getLong(7))).toMap
    rows.foreach { case (id, _, _, _, _, _, _, hsh) => assert(again(id) === hsh) }
  }

  test("q76 gini equals the brute sorted formula and sits in [0, 1)") {
    val spendMap = {
      val o = graft.Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      graft.Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), expr("cast(floor(l_extendedprice * 100) as bigint)"))
        .collect().map(r => (o(r.getLong(0)), r.getLong(1)))
        .groupBy(_._1).map { case (c, v) => (c, v.map(_._2).sum) }
    }
    val all = graft.Tables(spark, dir, "customer").select(col("c_custkey"))
      .collect().map(_.getLong(0))
      .map(c => (c, spendMap.getOrElse(c, 0L)))
    val sorted = all.sortBy(x => (x._2, x._1)).map(_._2)
    val n = sorted.length.toLong
    val s0 = sorted.sum
    val sxi = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val (num, den) = (2 * sxi - (n + 1) * s0, n * s0)
    val r = Relational.q76Gini(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, s0, num, den)))
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  test("cc24 assortativity equals the brute Pearson over endpoint degrees") {
    val l = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e0 = l.groupBy(_._1).values.flatMap { o =>
      val ps = o.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val e = e0 ++ e0.map(p => (p._2, p._1))
    val deg = e.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val xs = e.map(p => (deg(p._1), deg(p._2)))
    val m = xs.length.toLong
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val row = Dedup.cc24Assortativity(spark, dir).collect().head
    assert(row.getLong(0) === m)
    assert(row.getLong(1) === m * sxy - sx * sy)
    assert(row.getLong(2) === m * sxx - sx * sx)
    assert(row.getLong(2) === row.getLong(3)) // x↔y symmetry of the symmetrized list
    assert(math.abs(row.getDouble(4)) <= 1.0)
  }

  test("tx29 Simpson rationals equal the brute per-source shares") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val n = rows.length.toLong
      val s2 = rows.groupBy(_._2).values.map(v => v.length.toLong * v.length).sum
      (src, (n, n * n - s2, n * n))
    }
    val got = TextOps.tx29Diversity(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
  }

  test("q78 digit counts cover all orders and deviations sum to ~zero") {
    val rows = Relational.q78Benford(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = rows.head._3
    assert(rows.map(_._2).sum === n) // every order has a leading digit 1-9
    // Σ dev = 1000·n − n·Σexpected_pm = 0 exactly (the per-milles sum to 1000)
    assert(rows.map(_._5).sum === 0L)
    assert(rows.map(_._1).sorted.toSeq === (1 to 9))
  }

  test("q79 z-score equals the brute two-proportion formula") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val conv = ev.groupBy(_._1).map { case (u, rows) =>
      (u, if (rows.count(_._2 == "purchase") >= 14) 1L else 0L) }
    val (aU, bU) = conv.partition(_._1 % 2 == 0)
    val (n1, c1) = (aU.size.toLong, aU.values.sum)
    val (n2, c2) = (bU.size.toLong, bU.values.sum)
    val row = EventOps.q79AbTest(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((n1, c1, n2, c2)))
    assert(row.getLong(4) === c1 * n2 - c2 * n1)
    val z = (c1 * n2 - c2 * n1).toDouble /
      math.sqrt((c1 + c2).toDouble * (n1 + n2 - c1 - c2).toDouble *
        n1.toDouble * n2.toDouble / (n1 + n2).toDouble)
    assert(row.getDouble(5) === z)
  }

  test("tp12 erasure impacts are honest against independent recomputes") {
    val rows = Curation.tp12GdprErasure(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val del = docs.map(_._1).filter(_ % 83 == 7).toSet
    assert(rows("docs_erased") ===
      ((del.size.toLong, docs.filter(d => del(d._1)).map(_._3).sum)))
    // keeper reassignment / dissolution from an independent md5 clustering
    val byHash = docs.groupBy(d => java.security.MessageDigest.getInstance("MD5")
      .digest(d._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val reassigned = byHash.values.filter { m =>
      val ids = m.map(_._1)
      val surv = ids.filterNot(del)
      surv.nonEmpty && del(ids.min) }
    assert(rows("keepers_reassigned")._1 === reassigned.size.toLong)
    val dissolved = byHash.values.filter(m => m.forall(d => del(d._1)))
    assert(rows("clusters_dissolved")._1 === dissolved.size.toLong)
    // split rows cover every split and lost+kept = split size
    val split = Curation.ds01HashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    split.groupBy(_._2).foreach { case (sp, members) =>
      val (lost, kept) = rows(s"split_$sp")
      assert(lost === members.count(m => del(m._1)).toLong, s"split $sp lost")
      assert(lost + kept === members.length.toLong, s"split $sp total")
    }
  }

  test("q80 Lorenz points equal the brute descending cumulative shares") {
    val spendMap = {
      val o = graft.Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      graft.Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), expr("cast(floor(l_extendedprice * 100) as bigint)"))
        .collect().map(r => (o(r.getLong(0)), r.getLong(1)))
        .groupBy(_._1).map { case (c, v) => (c, v.map(_._2).sum) }
    }
    val all = graft.Tables(spark, dir, "customer").select(col("c_custkey"))
      .collect().map(_.getLong(0)).map(c => (c, spendMap.getOrElse(c, 0L)))
    val sorted = all.sortBy(x => (-x._2, x._1)).map(_._2)
    val n = sorted.length.toLong
    val total = sorted.sum
    val want = Seq(10L, 50L, 100L, 200L).map { p =>
      val k = (n * p + 999) / 1000
      (p, (k, sorted.take(k.toInt).sum, total))
    }.toMap
    val got = Relational.q80Pareto(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    // monotone: a bigger slice never carries less
    val shares = Seq(10L, 50L, 100L, 200L).map(p => got(p)._2)
    assert(shares === shares.sorted)
  }

  test("cc25 rich-club densities equal the brute club subgraphs") {
    val l = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e0 = l.groupBy(_._1).values.flatMap { o =>
      val ps = o.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val deg = (e0.map(_._1) ++ e0.map(_._2))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val want = Seq(64L, 128L, 192L, 256L).flatMap { k =>
      val club = deg.filter(_._2 > k).keySet
      if (club.isEmpty) None
      else Some((k, (club.size.toLong,
        e0.count(e => club(e._1) && club(e._2)).toLong)))
    }.toMap
    val got = Dedup.cc25RichClub(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("mm11 decimation halves the stream, keeps RMS, and is golden-stable") {
    // out_hash is spec-only since round 6 (the registered query projects
    // it out for the fixture-arithmetic oracle) — read the full Dataset
    val rows = Multimodal.resampleAudio(
        Multimodal.mediaFromDocuments(spark, dir)).toDF().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nIn, nOut, rin, rout, _) =>
      assert(nOut === (nIn + 1) / 2, s"media $id")
      // pair-averaging cannot create energy; near-white fixtures keep most
      assert(rout <= rin + 1, s"media $id rms")
    }
    val again = Multimodal.resampleAudio(
        Multimodal.mediaFromDocuments(spark, dir)).toDF().collect()
      .map(r => (r.getLong(0), r.getLong(5))).toMap
    rows.foreach { case (id, _, _, _, _, h) => assert(again(id) === h) }
  }

  test("mm12 picks exactly one thumbnail per mm05 scene, inside its bounds") {
    val scenes = Multimodal.mm05SceneCuts(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getInt(3))))
      .toMap
    val thumbs = Multimodal.mm12SceneThumbnails(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getLong(3))))
    assert(thumbs.nonEmpty)
    // one per scene, covering the same scene set
    assert(thumbs.map(_._1).toSet === scenes.keySet)
    assert(thumbs.length === thumbs.map(_._1).distinct.length)
    thumbs.foreach { case (k @ (id, sc), (fi, sharp)) =>
      val (st, n) = scenes(k)
      assert(fi >= st && fi < st + n, s"media $id scene $sc")
      assert(sharp >= 0L)
    }
  }

  test("q81 LTV triangle equals the brute cohort matrix") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = ev.groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).min) }
    val want = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case (k, rows) =>
        (k, (rows.map(_._1).distinct.length.toLong, rows.length.toLong,
          rows.map(_._3).sum)) }
    val got = EventOps.q81CohortLtv(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.map(x => (x._1, (x._2._1, x._2._2, x._2._3))).toMap === want)
    // cumulative really accumulates per cohort in age order
    got.groupBy(_._1._1).foreach { case (c, cells) =>
      val sorted = cells.sortBy(_._1._2)
      assert(sorted.map(_._2._3).scanLeft(0L)(_ + _).tail === sorted.map(_._2._4).toSeq,
        s"cohort $c")
    }
  }

  test("q82 median gap equals the brute sorted middle") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val fv = rows.filter(_._2 == "view").map(_._3).minOption
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      (fv, fp) match {
        case (Some(v), Some(p)) if p >= v => Some(p - v)
        case _ => None
      }
    }.toSeq.sorted
    val n = gaps.length
    val m2 = gaps((n - 1) / 2) + gaps(n / 2)
    val row = EventOps.q82TimeToConvert(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1)) === ((n.toLong, m2)))
    assert(row.getDouble(2) === m2 / 2.0)
  }

  test("mv10 synopsis serves through deletions and rescans a forced hole") {
    import spark.implicits._
    val path = Files.createTempDirectory("mv10-spec").toFile
    try {
      // lang zz: the THREE smallest values (1,2,3) all get deleted →
      // synopsis (k=3) exhausts → targeted rescan must find min=100.
      // lang aa: one in-fence delete + one insert → pure synopsis path.
      val base = Seq(
        ("zz", 1L), ("zz", 2L), ("zz", 3L), ("zz", 100L), ("zz", 200L),
        ("aa", 10L), ("aa", 20L), ("aa", 30L), ("aa", 40L)).toDF("lang", "v")
      MatView.minMaxState(base, path.getPath)
      val delta = Seq(
        ("zz", 1L, -1L), ("zz", 2L, -1L), ("zz", 3L, -1L),
        ("aa", 10L, -1L), ("aa", 5L, 1L)).toDF("lang", "v", "w")
      val cur = Seq( // base minus deletes plus inserts
        ("zz", 100L), ("zz", 200L),
        ("aa", 5L), ("aa", 20L), ("aa", 30L), ("aa", 40L)).toDF("lang", "v")
      val got = MatView.minMaxRollForward(spark, path.getPath, delta, cur)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === Map("zz" -> ((2L, 100L, 200L)), "aa" -> ((4L, 5L, 40L))))
      // and the driver query equals a direct recompute on real data
      val served = MatView.mv10MinmaxRollforward(spark, dir)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val want = graft.Tables(spark, dir, "documents")
        .filter(col("doc_id") % 10 =!= 7)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(served === want)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(path)
  }
}
