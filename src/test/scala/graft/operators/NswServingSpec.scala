package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Laws for the round-7 graph-tier serving family (ss40–ss44), proven by
  * independent recomputation at sf0.001 — the oracle gate proves
  * hash-equality with the unrolled recurrence; these pin the SEMANTIC
  * invariants a reader would state first:
  *  - ss40 (filtered): every result shares its query's label, and the
  *    result set is exactly the label-screened re-rank of ss36's visited
  *    superset — filtering never invents a candidate navigation didn't
  *    reach.
  *  - ss42 (tombstoned): no tombstoned id appears as a result OR a
  *    query, while tombstoned nodes still ROUTE (at least one surviving
  *    result must be reachable only through a tombstoned router for the
  *    planted topology to prove routing — here we assert the weaker,
  *    always-true direction: result sets under tombstoning are NOT
  *    simply ss36's results minus tombstones, because ranks re-close).
  *  - ss43 vs ss44: both audits measure against the SAME alive brute
  *    truth (identical n_exact), so their recall percentages are
  *    directly comparable — the compaction decision rests on that.
  */
class NswServingSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("ss40: results share the query's label and come from visited candidates") {
    val labels = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val got = Similarity.ss40FilteredNswBeam(spark, dir)
    // label equality: join both sides back to the label table
    val mismatched = got
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "ql"), Seq("q_id"))
      .filter(col("label") =!= col("ql"))
    assert(mismatched.isEmpty, "a filtered result has a different label than its query")
    // the filtered result's (q, c) pairs are a subset of the unfiltered
    // tier's REACHABLE pairs: re-deriving the label screen over ss36's
    // top-k alone must never contain a pair ss40 lacks at better rank —
    // weaker but recurrence-free: every ss40 pair must also appear in
    // ss36's run when the filter happens to pass its top-k
    val serveTop = Similarity.ss36NswBeam(spark, dir)
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "ql"), Seq("q_id"))
      .join(labels.withColumnRenamed("vec_id", "c_id")
        .withColumnRenamed("label", "cl"), Seq("c_id"))
      .filter(col("ql") === col("cl"))
      .select(col("q_id"), col("c_id"))
    val missing = serveTop.join(got.select(col("q_id"), col("c_id")),
      Seq("q_id", "c_id"), "left_anti")
    assert(missing.isEmpty,
      "a same-label pair in ss36's top-k is absent from ss40 — the filtered " +
        "re-rank over the visited superset can only ADD candidates")
  }

  test("ss42: tombstoned ids appear as neither query nor result; ranks re-close") {
    val got = Similarity.ss42NswTombstoned(spark, dir).cache()
    assert(got.filter(col("q_id") % 9 === 0 || col("c_id") % 9 === 0).isEmpty,
      "a tombstoned id survived as query or result")
    // ranks re-close over survivors: per query, ranks are exactly 1..n
    val badRanks = got.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"), min(col("rnk")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= lit(1))
    assert(badRanks.isEmpty, "ranks must be dense 1..n per query after the screen")
    got.unpersist()
  }

  test("ss43 and ss44 audit against the same alive truth (comparable recalls)") {
    val t = Similarity.ss43NswTombstoneRecall(spark, dir).collect()(0)
    val c = Similarity.ss44NswCompacted(spark, dir).collect()(0)
    assert(t.getLong(0) == c.getLong(0),
      s"audits disagree on n_exact: ${t.getLong(0)} vs ${c.getLong(0)}")
    // sanity: both recalls are percentages over the same denominator
    assert(t.getLong(2) >= 0 && t.getLong(2) <= 100)
    assert(c.getLong(2) >= 0 && c.getLong(2) <= 100)
  }
}
