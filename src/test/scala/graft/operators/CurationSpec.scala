package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics tests for the curation surface (Curation.scala) and the as-of
  * join — planted fixtures pin the edge cases the sf-testdata oracle can't
  * isolate: same-second as-of ties, no-prior-view nulls, normalization
  * inside decontamination grams, and split determinism.
  */
class CurationSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("ds01: every doc lands in exactly one split, roughly 80/10/10") {
    val out = Curation.ds01HashSplit(spark, dir).cache()
    val total = out.count()
    val bynm = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bynm.values.sum == total)
    assert(bynm.keySet.subsetOf(Set("train", "validation", "test")))
    val trainFrac = bynm.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
    // buckets are a pure function of content: re-running yields the same rows
    val again = Curation.ds01HashSplit(spark, dir)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("ds02: kept docs respect their stratum's rate; unknown langs keep all") {
    val kept = Curation.ds02StratifiedSample(spark, dir)
    // es keeps 100% -> every es doc survives; fr keeps 25% -> strictly fewer
    val docs = graft.Tables(spark, dir, "documents")
    val esAll = docs.filter(col("lang") === "es").count()
    val esKept = kept.filter(col("lang") === "es").count()
    assert(esKept == esAll)
    val frAll = docs.filter(col("lang") === "fr").count()
    val frKept = kept.filter(col("lang") === "fr").count()
    assert(frKept < frAll && frKept > 0, s"fr kept $frKept of $frAll")
  }

  test("dc01: planted 5-gram overlap is found through normalization; clean docs are not flagged") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("curation-docs").toFile
    try {
      // doc 0 is eval (0 % 97 == 0); doc 1 shares exactly one normalized
      // 5-gram with it (case/punctuation differ); doc 2 shares none.
      Seq(
        (0L, "Alpha beta gamma delta epsilon zeta"),
        (1L, "prefix words then ALPHA, beta gamma... delta EPSILON? no wait"),
        (2L, "completely unrelated text with no shared phrases at all here")
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      // doc1 shares "alpha beta gamma delta epsilon"? Its normalized tokens
      // are: prefix words then alpha beta gamma delta epsilon no wait —
      // the gram "alpha beta gamma delta epsilon" appears in both.
      val out = Curation.dc01Decontaminate(spark, tmp.getPath).collect()
      assert(out.toSeq == Seq(Row(1L, 1L)), out.toSeq.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("ds04: documents from one source NEVER straddle the split fence") {
    val out = Curation.ds04SourceSplit(spark, dir)
    val perSource = out.groupBy("source")
      .agg(countDistinct(col("split")).as("n_splits")).collect()
    assert(perSource.nonEmpty)
    for (r <- perSource)
      assert(r.getLong(1) == 1L, s"source ${r.getString(0)} spans splits")
    // and the group split disagrees with the per-doc split for SOME doc —
    // otherwise it wouldn't be doing anything ds01 doesn't
    val doc = Curation.ds01HashSplit(spark, dir).select("doc_id", "split")
      .withColumnRenamed("split", "doc_split")
    val joined = out.join(doc, "doc_id")
      .filter(col("split") =!= col("doc_split")).count()
    assert(joined > 0, "group split never disagrees with doc split?")
  }

  test("ds05: kept docs are exactly the per-language budget prefix") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent reference: walk each language in doc_id order, keep while
    // the running total BEFORE the doc is under budget (matches the oracle)
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._1).toSeq.flatMap { case (id, _, n) =>
        val keep = acc < Curation.langTokenBudget
        acc += n
        if (keep) Some(id) else None
      }
    }.toSet
    val got = Curation.ds05TokenBudget(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty && got.size < docs.length,
      "budget should bite at this scale factor")
  }

  test("dd13: first occurrence of a repeated chunk wins; repeats are dropped") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dd13-docs").toFile
    try {
      // 20-token chunks built explicitly: A repeated across docs 1 and 2
      // (and twice inside doc 3); B unique to doc 1; C unique to doc 2.
      def chunk(word: String) = Seq.fill(20)(word).mkString(" ")
      Seq(
        (1L, chunk("alpha") + " " + chunk("beta")),  // A B -> both kept
        (2L, chunk("alpha") + " " + chunk("gamma")), // A dropped, C kept
        (3L, chunk("delta") + " " + chunk("delta"))  // intra-doc repeat: 1 of 2
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Curation.dd13ParagraphDedup(spark, tmp.getPath)
        .orderBy("doc_id").collect().toSeq
      assert(out == Seq(
        Row(1L, 2L, 2L), Row(2L, 2L, 1L), Row(3L, 2L, 1L)), out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("dd13: empty and sub-chunk docs don't break the chunker") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dd13-edge").toFile
    try {
      Seq(
        (1L, ""),            // zero tokens -> zero chunks -> absent
        (2L, "only three words"), // shorter than one chunk -> 1 partial chunk
        (3L, "only three words")  // identical partial chunk -> deduped
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Curation.dd13ParagraphDedup(spark, tmp.getPath)
        .orderBy("doc_id").collect().toSeq
      assert(out == Seq(Row(2L, 1L, 1L), Row(3L, 1L, 0L)), out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("q32: as-of picks the latest view at-or-before each click; no prior view -> null") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("curation-events").toFile
    try {
      def ns(sec: Long): Long = sec * 1000000000L
      // (event_id, ts_nanos, user_id, event_type)
      Seq(
        (10L, ns(100), 1L, "view"),  // same second as click 20; deduped with 11
        (11L, ns(100), 1L, "view"),  // max id at (u1, t100) -> the winner
        (20L, ns(100), 1L, "click"), // same-second view IS eligible
        (21L, ns(150), 1L, "click"), // latest view <= 150 is still t100
        (30L, ns(50), 2L, "click"),  // u2 has no view before t50
        (31L, ns(60), 2L, "view"),
        (32L, ns(70), 2L, "click")   // u2's view at t60 attaches
      ).toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val out = EventOps.q32AsofJoin(spark, tmp.getPath)
        .orderBy("click_id").collect().toSeq
      assert(out == Seq(
        Row(20L, 1L, 100L, 11L, 100L),
        Row(21L, 1L, 150L, 11L, 100L),
        Row(30L, 2L, 50L, null, null),
        Row(32L, 2L, 70L, 31L, 60L)), out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("ds11: ascending ikey interleaves sources proportionally to weight at every prefix") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ds11-prop").toFile
    try {
      // two sources, enough docs each that neither exhausts early
      (0 until 400).map { i =>
        (i.toLong, s"text $i", "en", if (i % 2 == 0) "alpha" else "beta")
      }.toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = Curation.ds11SourceInterleave(spark, tmp.getPath)
        .orderBy(col("ikey"), col("source"), col("pos"))
        .select(col("source"), col("weight")).collect()
      val weights = rows.map(r => r.getString(0) -> r.getInt(1)).toMap
      // weighted-fair-queueing invariant: in any prefix, each source's
      // count stays within ±1 virtual-time slot of its weight share
      var counts = Map.empty[String, Long].withDefaultValue(0L)
      rows.zipWithIndex.foreach { case (r, i) =>
        counts = counts.updated(r.getString(0), counts(r.getString(0)) + 1)
        val wTot = weights.values.sum.toDouble
        weights.foreach { case (src, w) =>
          val expected = (i + 1) * w / wTot
          assert(math.abs(counts(src) - expected) <= weights.size + 1,
            s"prefix ${i + 1}: $src has ${counts(src)}, expected ~$expected (w=$w)")
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("tp05: shards are balanced and each preserves the mixture order") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tp05-shards").toFile
    try {
      (0 until 600).map { i =>
        val lang = Seq("en", "de", "fr")(i % 3)
        (i.toLong, (s"w$i " * 20).trim, lang, "src")
      }.toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Curation.tp05MixtureShards(spark, tmp.getPath).collect()
      assert(out.nonEmpty)
      // round-robin over the global rank → shard sizes differ by at most 1
      val sizes = out.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
      assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
      // within a shard, ascending shard_pos must follow ascending ikey
      out.groupBy(_.getInt(3)).foreach { case (_, rows) =>
        val byPos = rows.sortBy(_.getLong(4)).map(_.getLong(2))
        assert(byPos.sameElements(byPos.sorted), "shard order broke the interleave")
      }
      // only ds10-kept docs appear
      val kept = Curation.ds10TempMixture(spark, tmp.getPath)
        .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out.map(_.getLong(0)).toSet == kept)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("dc03: islands merge — separate, overlapping, and adjacent spans") {
    import spark.implicits._
    // doc 194 (194 % 97 == 0) is the eval doc; its 5-grams are the leak set
    val docs = Seq(
      194L -> "a b c d e f g h i j",
      // two isolated hits: [1,5] and [11,15], gap > gram span → two islands
      1L -> "a b c d e z1 z2 z3 z4 z5 f g h i j",
      // six consecutive overlapping hits → one span covering all 10 tokens
      2L -> "a b c d e f g h i j",
      // hits at gstart 1 and 6 touch exactly (6 == 1+5) → merged island
      3L -> "a b c d e a b c d e",
      // no eval grams at all → absent from the output
      4L -> "u v w x y z u v w x y z"
    ).toDF("doc_id", "text")
    val got = Curation.spanDecontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = Set(
      (1L, 1L, 5L, 1L), (1L, 11L, 15L, 1L),
      (2L, 1L, 10L, 6L),
      (3L, 1L, 10L, 2L))
    assert(got == expected, got.toString)
  }

  test("ds15: SCD2 intervals partition each key's presence, no overlaps") {
    val out = Curation.ds15Scd2(spark, dir).cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getInt(2), if (r.isNullAt(3)) Int.MaxValue else r.getInt(3)))
    // structural invariants of any SCD2 merge:
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val sorted = ivs.sortBy(_._3)
      sorted.foreach { case (_, _, from, to) =>
        assert(from < to, s"key $k: empty/negative interval [$from, $to)") }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 <= b._3, s"key $k: overlapping intervals $a $b")
          // adjacent intervals with equal value would mean a missed merge
          // (a break was emitted without a change or gap)
          assert(a._4 < b._3 || a._2 != b._2,
            s"key $k: un-merged adjacent equal-value intervals $a $b")
        case _ => ()
      }
    }
    // deletions exist (key%11=0 keys absent from v3 close their interval)
    // and every key mutated at v2 (key%7=0) has an interval opening there
    assert(rows.exists(r => r._4 == 3), "expected closed intervals at v3")
    assert(rows.filter(_._1 % 7 == 0).exists(_._3 == 2),
      "expected v2-opening intervals for bumped keys")
    out.unpersist()
  }

  test("ds18: growing 8 -> 9 shards moves roughly 1/9 of docs, never most of them") {
    import org.apache.spark.sql.functions.col
    val out = Curation.ds18ConsistentShards(spark, "/root/testdata/sf0.01")
      .localCheckpoint()
    val n = out.count().toDouble
    val moved = out.filter(col("moved")).count().toDouble
    // consistent hashing's contract: expected moved fraction = 1/9 ≈ 0.11;
    // allow generous slack for the 128-point ring's variance, but a
    // hash-mod-style reshuffle (~8/9 moved) must fail loudly
    assert(moved / n > 0.02 && moved / n < 0.35,
      s"moved fraction ${moved / n} outside consistent-hashing range")
    // every shard id in range
    assert(out.filter(col("shard8") < 0 || col("shard8") > 7 ||
      col("shard9") < 0 || col("shard9") > 8).count() === 0)
  }

  test("ds19: water-filling keeps exactly floor(share·T/1000) per language") {
    val dir = "/root/testdata/sf0.001"
    val shares = Map("en" -> 400, "fr" -> 250, "de" -> 200, "es" -> 100, "zh" -> 50)
    val counts = graft.Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent recomputation of the water-filling arithmetic
    val t = shares.map { case (l, s) => counts(l) * 1000L / s }.min
    val expect = shares.map { case (l, s) => l -> s * t / 1000L }
    val kept = Curation.ds19TargetMixture(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("k"), max(col("keep_n")).as("kn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((l, e) <- expect if e > 0) {
      assert(kept(l)._1 == e, s"$l kept ${kept(l)._1}, expected $e")
      assert(kept(l)._2 == e, s"$l keep_n ${kept(l)._2}, expected $e")
    }
    // the binding language is cut by less than one per-mille step
    val bindLang = shares.minBy { case (l, s) => counts(l) * 1000L / s }._1
    assert(counts(bindLang) - expect(bindLang) <= counts(bindLang) / 100 + 1,
      s"binding language $bindLang over-cut: ${expect(bindLang)} of ${counts(bindLang)}")
    // kept share matches the target within integer-floor error
    val total = expect.values.sum
    for ((l, e) <- expect if total > 0)
      assert(math.abs(e * 1000 - shares(l).toLong * total) <= 2000,
        s"$l share drifted: kept $e of $total vs target ${shares(l)} pm")
  }
}
