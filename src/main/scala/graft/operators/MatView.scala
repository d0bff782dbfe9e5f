package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  // ---------------------------------------------------------------------
  // mv02: DAY-PARTITIONED incremental event rollup — the time-dimension
  // variant of mv01 and the canonical warehouse nightly: a standing
  // (day, event_type) aggregate over the event stream, state laid out
  // partitionBy(day) so (a) serving "one day's numbers" partition-prunes
  // to that day's files (pinned in MatViewSpec) and (b) a late-data
  // backfill only rewrites the affected day partitions. Value sums ride
  // in DECIMAL(18,2) — exact, associative, partition-order-independent —
  // and only the served projection casts to double, so the merged view
  // hash-matches the oracle's one-pass recompute over all events.
  // ---------------------------------------------------------------------
  private val dayCol = "unix_timestamp(ts) div 86400"

  private[operators] def eventPartials(ev: DataFrame): DataFrame =
    ev.groupBy(expr(dayCol).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("sum_val"))

  def buildEventState(ev: DataFrame, stateDir: String): Unit =
    eventPartials(ev).write.partitionBy("day").mode("overwrite").parquet(stateDir)

  /** Merge an increment into the day-partitioned state. The partitionBy
    * column reads back as the inferred INT — recast to BIGINT before the
    * union so the monoid merge stays type-stable. */
  def rollForwardEvents(s: SparkSession, stateDir: String,
      increment: DataFrame): DataFrame =
    s.read.parquet(stateDir).withColumn("day", col("day").cast("long"))
      .unionByName(eventPartials(increment))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_val")).cast(DecimalType(18, 2)).as("sum_val"))

  def mv02EventRollforward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    // the standing state covers everything before the stream's last day;
    // that final day is "tonight's batch"
    val lastDay = ev.agg(max(expr(dayCol))).head.getLong(0)
    val stateDir = statePathFor(dir) + "_ev"
    buildEventState(ev.filter(expr(dayCol) < lastDay), stateDir)
    rollForwardEvents(s, stateDir, ev.filter(expr(dayCol) === lastDay))
      .select(col("day"), col("event_type"), col("n_events"),
        col("sum_val").cast("double").as("sum_value"))
  }

  val mv02Oracle: String =
    """SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, event_type,
      | CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "mv01_agg_rollforward" -> (mv01AggRollforward _),
    "mv02_event_rollforward" -> (mv02EventRollforward _))

  val oracles: Map[String, String] = Map(
    "mv01_agg_rollforward" -> mv01Oracle,
    "mv02_event_rollforward" -> mv02Oracle)
}
