package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Planted-fixture semantics for dd09 incremental dedup — the properties
  * the sf-testdata oracle can't isolate:
  *   - a new doc exactly copying an old doc flags dup_exact (and, with
  *     identical shingles, dup_near);
  *   - a new doc whose shingle SET matches an old doc's (text differs)
  *     flags dup_near only;
  *   - two new docs duplicating EACH OTHER but nothing old are NOT
  *     flagged — the incremental contract is new-vs-corpus, never
  *     new-vs-new (that pass belongs to the batch pipeline dd07);
  *   - old docs and unique new docs never appear.
  *
  * doc_id % 10 < 8 is "old corpus", >= 8 is "today's batch" (dd09's
  * stand-in for the precomputed store + incremental read).
  */
class DedupSpec extends SparkSpec {

  test("dd09: flags new-vs-old exact and near dups; ignores new-vs-new") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup-docs").toFile
    try {
      // "a b c" repeated: distinct shingle set is identical for 2× and 3×
      // repetitions, so MinHash signatures (hence every LSH band) match
      // deterministically while the texts differ -> near-dup, not exact.
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"), // old
        (2L, "a b c a b c"),                                       // old
        (3L, "old corpus text that nothing in the new batch resembles"),
        (8L, "the quick brown fox jumps over the lazy dog today"), // new = copy of 1
        (9L, "a b c a b c a b c"),                                 // new ~ 2
        (18L, "u v w x y z u v w x y z mutual twins"),             // new = copy of 19
        (19L, "u v w x y z u v w x y z mutual twins"),             // new = copy of 18
        (28L, "a genuinely fresh document with entirely new content here")
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Dedup.dd09IncrementalDedup(spark, tmp.getPath)
        .orderBy("doc_id").collect().toSeq
      assert(out == Seq(
        Row(8L, true, true),
        Row(9L, false, true)), out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("dd12: bloom pre-filter preserves dd09's answer and actually prunes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup-docs-bloom").toFile
    try {
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "a b c a b c"),
        (3L, "old corpus text that nothing in the new batch resembles"),
        (8L, "the quick brown fox jumps over the lazy dog today"),
        (9L, "a b c a b c a b c"),
        (18L, "u v w x y z u v w x y z mutual twins"),
        (19L, "u v w x y z u v w x y z mutual twins"),
        (28L, "a genuinely fresh document with entirely new content here")
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Dedup.dd12BloomIncremental(spark, tmp.getPath)
      assert(out.orderBy("doc_id").collect().toSeq ==
        Seq(Row(8L, true, true), Row(9L, false, true)))
      // The pre-filter is in the plan on both probes, as the NATIVE
      // codegen'd expression (round 7: no boxed UDF on the screen path)
      val plan = out.queryExecution.executedPlan.toString
      val screens = "bloom_might_contain".r.findAllMatchIn(plan).size
      assert(screens >= 2, s"expected both native bloom screens, got $screens\n" +
        plan.take(3000))
      assert(!plan.contains("bloom_hash") && !plan.contains("bloom_band"),
        "boxed bloom UDFs must be gone from the screen path")
      // ...and it genuinely drops novel rows before the shuffles: of the 5
      // new docs only the exact copy (8) must pass the hash bloom; FPs are
      // possible in principle but the filter may never pass everything.
      val docs = spark.read.parquet(s"$tmp/documents.parquet")
      val old = docs.filter($"doc_id" % 10 < 8)
      val neu = docs.filter($"doc_id" % 10 >= 8)
      val hashesOld = old.select(org.apache.spark.sql.functions.md5($"text").as("h"))
      val bandsOld = Dedup.lshBands(Dedup.minhashSigsFromSets(
        Dedup.shingleSets(old)).drop("sh"))
      val p = Dedup.BloomPrefilter.build(spark, hashesOld, bandsOld)
      val passed = neu.select($"doc_id",
        org.apache.spark.sql.functions.md5($"text").as("h"))
        .filter(p.hashFilter).count()
      assert(passed >= 1 && passed < neu.count(), s"hash bloom passed $passed")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("dd14: containment is asymmetric where Jaccard is symmetric") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup-docs-cont").toFile
    try {
      // Doc 2 = doc 1's text + 3 extra words: every shingle of 1 appears
      // in 2 (containment 1→2 = 1.0) but 2 has 3 junction/extra shingles
      // of its own (Jaccard = 20/23 ≈ 0.87 < 0.9), so a_in_b must flag
      // and b_in_a must not — the template-inside-a-longer-page signal
      // that symmetric Jaccard (dd05) misses by construction. Docs 3/4
      // are identical → contained both ways. Jaccard 0.87 band-matches
      // w.h.p. with 4 bands × 2 rows; the candidate assert below fails
      // loudly if this fixture ever stops being an LSH candidate.
      val template = (1 to 22).map(i => s"w$i").mkString(" ")
      Seq(
        (1L, template),
        (2L, template + " extra tail words"),
        (3L, "p q r s t u v p q r s t u v both ways twin"),
        (4L, "p q r s t u v p q r s t u v both ways twin"),
        (5L, "nothing in common with anything else at all here")
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Dedup.dd14ContainmentVerify(spark, tmp.getPath)
        .orderBy("doc1", "doc2").collect().toSeq
      val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"fixture lost its LSH candidate: $out")
      assert(pairs.contains((3L, 4L)), s"fixture lost its LSH candidate: $out")
      val r12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
      assert(r12.getLong(2) == 20L && r12.getLong(3) == 20L &&
        r12.getLong(4) == 23L, r12.toString)
      assert(r12.getBoolean(5) && !r12.getBoolean(6), r12.toString)
      val r34 = out.find(r => r.getLong(0) == 3L && r.getLong(1) == 4L).get
      assert(r34.getBoolean(5) && r34.getBoolean(6), r34.toString)
      assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("dd18: prefix filtering is LOSSLESS at the threshold — recall 1.0 vs brute force") {
    import org.apache.spark.sql.functions._
    // The theorem under dd18: any pair with Jaccard >= 0.7 shares a
    // prefix token, so the candidate join cannot miss it. Check against
    // the exhaustive all-pairs ground truth (fine at sf0.001's size).
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val sharr = Dedup.shingleSets(docs).localCheckpoint()
    val brute = sharr.as("a").crossJoin(sharr.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("ni", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("nu", size(col("a.sh")) + size(col("b.sh")) - col("ni"))
      .filter(col("ni") * 10 >= col("nu") * 7)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.dd18PrefixFilter(spark, "/root/testdata/sf0.001")
      .filter(col("is_dup"))
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no >=0.7 pairs; recall check is vacuous")
    assert(brute.subsetOf(found),
      s"prefix filter missed true pairs: ${brute -- found}")
  }

  test("dd19: chunks survive a mid-document edit; exact copies share everything") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup-cdc").toFile
    try {
      // 200 varied tokens; doc 2 inserts 5 tokens mid-way — content-defined
      // boundaries re-synchronize after the edit, so chunks outside the
      // edited region keep their hashes (the CDC property fixed n-grams
      // lack: every downstream gram shifts).
      val base = (0 until 200).map(i => s"w${(i * 7) % 97}n$i")
      val edited = base.take(100) ++ Seq("X1", "X2", "X3", "X4", "X5") ++ base.drop(100)
      Seq(
        (1L, base.mkString(" ")),
        (2L, edited.mkString(" ")),
        (3L, (0 until 60).map(i => s"z${i}q${i % 13}").mkString(" ")), // unrelated
        (4L, base.mkString(" "))                                      // exact copy of 1
      ).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Dedup.dd19CdcChunks(spark, tmp.getPath)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // exact copies: every chunk shared (docs 1 and 4 are identical)
      assert(out(1L)._1 == out(1L)._2, out.toString)
      assert(out(4L)._1 == out(4L)._2, out.toString)
      // the edited revision still shares most chunks with the original —
      // and has at least one unshared chunk (the edit itself)
      assert(out(2L)._2 >= out(2L)._1 / 2,
        s"edit destroyed chunk sharing: ${out(2L)}")
      assert(out(2L)._2 < out(2L)._1, s"edit chunk leaked: ${out(2L)}")
      // the unrelated doc shares nothing
      assert(out(3L)._2 == 0L, out.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }
}
