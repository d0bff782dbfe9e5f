package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tx12 BPE merge application: the fold must BE the greedy left-to-right
  * non-overlapping pass (the Sennrich merge step), the mining must stay a
  * top-k (no global sort), and the per-round merge must stay a per-row
  * projection (no exchange). */
class BpeMergeSpec extends SparkSpec {

  private def toksOf(rows: Seq[(Long, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "toks")
  }

  test("fold = greedy non-overlapping merge (the 'x x x' case)") {
    val df = toksOf(Seq(
      1L -> Seq("x", "x", "x"),          // overlap: first pair wins
      2L -> Seq("a", "b", "a", "b"),     // two disjoint merges
      3L -> Seq.empty[String],           // empty doc survives
      4L -> Seq("q"),                    // single token untouched
      5L -> Seq("za", "b"),              // prefix of a token is NOT the token
      6L -> Seq("a", "bz")))             // suffix false-match impossible
    val out = df.withColumn("m", TextOps.mergedToks("a", "b"))
      .select(col("doc_id"), col("m")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("x", "x", "x"))
    assert(out(2L) == Seq("ab", "ab"))
    assert(out(3L) == Seq.empty)
    assert(out(4L) == Seq("q"))
    assert(out(5L) == Seq("za", "b"))
    assert(out(6L) == Seq("a", "bz"))
    val xx = df.withColumn("m", TextOps.mergedToks("x", "x"))
      .filter(col("doc_id") === 1).select(col("m")).collect()(0).getSeq[String](0)
    assert(xx == Seq("xx", "x"), "greedy must not re-merge the fused token")
  }

  test("mining is TakeOrderedAndProject; the merge pass adds no exchange") {
    val dir = "/root/testdata/sf0.001"
    // tx10 and tx12's per-round mining share the same plan shape: partial
    // counts then a top-k — a global Sort here would be the 100 TB killer
    val mine = TextOps.tx10BpePairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(mine.contains("TakeOrderedAndProject"), mine.take(2000))
    // the merge application is a pure projection over the token arrays
    val merge = toksOf(Seq(1L -> Seq("a", "b")))
      .withColumn("m", TextOps.mergedToks("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!merge.contains("Exchange"), merge.take(2000))
    assert(!merge.contains("Sort"), merge.take(2000))
  }

  test("three mined rounds strictly shrink the corpus token count") {
    val dir = "/root/testdata/sf0.001"
    val merged = TextOps.tx12BpeMergeApply(spark, dir)
    val after = merged.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val before = TextOps.tx03TokenCount(spark, dir)
      .agg(sum(col("ws_tokens"))).collect()(0).getLong(0)
    assert(after < before, s"merges applied: $after vs $before")
    assert(merged.count() == 500)
  }
}
