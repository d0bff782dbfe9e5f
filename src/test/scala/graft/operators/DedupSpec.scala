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
      // The pre-filter is in the plan on both probes...
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_hash"), plan.take(3000))
      assert(plan.contains("bloom_band"), plan.take(3000))
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
}
