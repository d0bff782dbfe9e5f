package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental materialized-aggregate maintenance — the third member of
  * the engine's roll-forward family beside the dedup store
  * ([[DedupStore]]) and the persisted IVF index ([[Similarity]] ss05/
  * ss07): a standing per-group aggregate ("corpus stats by language")
  * kept current by merging each day's increment into a tiny partial
  * state table, never by rescanning the corpus.
  *
  * The state holds only COMMUTATIVE-MONOID partials (counts, sums,
  * maxes) — the decomposable aggregates Spark itself exploits for
  * map-side partial aggregation. That algebraic property is exactly what
  * makes the view maintainable: merge(state, partials(increment)) equals
  * partials(base ∪ increment) for ANY split of the data, so the
  * roll-forward result is bit-identical to a full recompute — which is
  * what the DuckDB oracle runs. Derived values that are NOT decomposable
  * (the average) are computed from the merged partials at read time, the
  * standard sum/count split.
  *
  * Scale shape: the state is O(|groups|) rows regardless of corpus size
  * (here |langs|; at 100 TB maybe thousands) and the roll-forward plan
  * touches state + increment only — one map-side-combined shuffle over
  * the increment, a |groups|-row merge, zero base-corpus I/O. MatViewSpec
  * pins that file-level: the merged plan's scans never include the base
  * table's files.
  */
object MatView {
  import Relational.Q

  /** Deterministic scratch location per input dir (same convention as
    * [[DedupStore.storePathFor]] — queries must stay pure functions of
    * (session, sfDir)). */
  private[operators] def statePathFor(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_mv_state_$tag"
  }

  /** Per-language monoid partials over any (lang, doc_id, n_chars, text)
    * slice: one map-side-combined hash aggregate. */
  private[operators] def partials(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("doc_id"), col("n_chars"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
          .as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_toks")).as("sum_tokens"),
        max(col("n_chars")).as("max_chars"),
        max(col("doc_id")).as("last_doc_id"))

  /** Materialize the view state from a base corpus (the nightly build). */
  def buildState(docs: DataFrame, stateDir: String): Unit =
    partials(docs).write.mode("overwrite").parquet(stateDir)

  /** state ⊎ partials(increment): O(|groups| + |increment|), reads the
    * state table and the increment — NEVER the base corpus. New groups
    * appearing only in the increment merge in through the union. */
  def rollForward(s: SparkSession, stateDir: String,
      increment: DataFrame): DataFrame =
    s.read.parquet(stateDir).unionByName(partials(increment))
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        sum(col("sum_tokens")).as("sum_tokens"),
        max(col("max_chars")).as("max_chars"),
        max(col("last_doc_id")).as("last_doc_id"))

  /** Read-time projection: merged partials + the non-decomposable
    * derivations (avg = sum/count — one exact IEEE division of two
    * exactly-represented integers, so it hash-matches the oracle). */
  private def serve(merged: DataFrame): DataFrame =
    merged.select(col("lang"), col("n_docs"), col("sum_chars"),
      col("sum_tokens"), col("max_chars"), col("last_doc_id"),
      (col("sum_chars").cast("double") / col("n_docs")).as("avg_chars"))

  // ---------------------------------------------------------------------
  // mv01: the full maintenance cycle — build the state from the standing
  // corpus (doc_id % 10 != 3), roll today's batch (% 10 == 3) forward,
  // serve the merged view. The oracle recomputes the aggregates over the
  // WHOLE corpus in one pass: hash-equality IS the incremental-view
  // correctness proof (merge(state, inc) ≡ full recompute).
  // ---------------------------------------------------------------------
  def mv01AggRollforward(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val stateDir = statePathFor(dir)
    buildState(docs.filter(col("doc_id") % 10 =!= 3), stateDir)
    serve(rollForward(s, stateDir, docs.filter(col("doc_id") % 10 === 3)))
  }

  val mv01Oracle: String =
    """SELECT lang,
      | CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      | CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS sum_tokens,
      | CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      | CAST(MAX(doc_id) AS BIGINT) AS last_doc_id,
      | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "mv01_agg_rollforward" -> (mv01AggRollforward _))

  val oracles: Map[String, String] = Map(
    "mv01_agg_rollforward" -> mv01Oracle)
}
