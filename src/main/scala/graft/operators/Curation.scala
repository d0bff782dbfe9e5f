package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset-curation operators for a training-data pipeline: deterministic
  * train/val/test splitting, per-stratum mixture sampling, and eval-set
  * decontamination. These sit downstream of the dedup/quality surface
  * ([[Dedup]], [[TextOps]]) and upstream of tokenization.
  *
  * Scale notes (the whole point of these shapes):
  *  - Splits/sampling are pure per-row hash arithmetic — zero shuffles,
  *    fully codegen'd, and stable under re-runs/backfills because the
  *    bucket derives from content, not from row order or RNG state.
  *  - Decontamination joins the (huge) training side against the (small)
  *    eval side on 60-bit n-gram hashes: the eval side broadcasts, so the
  *    100 TB side never shuffles; shipping 8-byte hashes instead of raw
  *    n-gram strings keeps the build side tiny.
  */
object Curation {
  import Relational.Q

  /** First 8 hex chars of md5 as a non-negative long in [0, 2^32) — the
    * portable content-hash bucket both Spark and DuckDB compute
    * identically. */
  private def hashBucket(c: Column, mod: Int): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % mod

  // ---------------------------------------------------------------------
  // ds01: deterministic train/val/test split by content hash. 80/10/10 by
  // md5 bucket — membership is a pure function of the document text, so
  // the split survives re-ingestion, sharding changes, and incremental
  // appends (unlike rand()-based sampling, which is neither stable nor
  // reproducible across partitionings).
  // ---------------------------------------------------------------------
  def ds01HashSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    docs.select(col("doc_id"), hashBucket(col("text"), 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
  }

  val ds01Oracle: String =
    """SELECT doc_id, bucket,
      | CASE WHEN bucket < 80 THEN 'train'
      |      WHEN bucket < 90 THEN 'validation'
      |      ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
      | FROM documents) t""".stripMargin

  // ---------------------------------------------------------------------
  // ds02: stratified mixture sampling — each language stratum keeps a
  // configured percentage, selected by a salted content hash (salt keeps
  // it independent of the ds01 split buckets). The rate table is a
  // broadcast dim; the corpus side is a scan + filter, no shuffle.
  // This is the "data mixture" knob of a training pipeline (e.g. upsample
  // low-resource languages, downsample boilerplate-heavy sources).
  // ---------------------------------------------------------------------
  private val mixRates: Seq[(String, Int)] =
    Seq("en" -> 40, "de" -> 80, "es" -> 100, "fr" -> 25, "zh" -> 60)

  def ds02StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val rates = mixRates.toDF("lang", "keep_pct")
    docs.join(broadcast(rates), Seq("lang"), "left")
      .withColumn("bucket", hashBucket(concat(lit("mix1:"), col("text")), 100))
      .filter(col("bucket") < coalesce(col("keep_pct"), lit(100)))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  val ds02Oracle: String = {
    val values = mixRates.map { case (l, p) => s"('$l', $p)" }.mkString(", ")
    s"""WITH r(lang, keep_pct) AS (VALUES $values),
       |b AS (SELECT doc_id, lang,
       |  ('0x' || substr(md5('mix1:' || text), 1, 8))::BIGINT % 100 AS bucket
       | FROM documents)
       |SELECT b.doc_id, b.lang, b.bucket
       |FROM b LEFT JOIN r USING (lang)
       |WHERE b.bucket < COALESCE(r.keep_pct, 100)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // dc01: eval-set decontamination — flag training documents sharing any
  // 5-token n-gram with the held-out eval slice (doc_id % 97 == 0 stands
  // in for a benchmark suite). Grams are canonicalized (lowercase,
  // alnum-only, collapsed whitespace) then reduced to 60-bit md5-prefix
  // hashes; the distinct eval-gram set is small → broadcast, so the
  // training side is scanned once with no shuffle before the final
  // per-doc count. Output: contaminated doc_id + how many distinct eval
  // grams it shares (the usual threshold input).
  // ---------------------------------------------------------------------
  /** (doc_id, gh) 5-gram hashes over canonicalized text. The gram hashing
    * is the native one-pass `ngram_hashes` expression
    * ([[graft.functions.NGramHashes]]) — bit-identical to the built-in
    * `conv(substring(md5(concat_ws(' ', slice(toks, i, 5))), 1, 15), 16, 10)`
    * chain the DuckDB oracle evaluates, but one reused digest/buffer per
    * row instead of an interpreted lambda over four expression nodes per
    * gram. */
  private def gramHashes(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val toks = expr("filter(split(norm, ' '), x -> x != '')")
    docs.select(col("doc_id"), norm.as("norm"))
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(expr("ngram_hashes(toks, 5)")).as("gh"))
  }

  // ---------------------------------------------------------------------
  // dd10: cross-document repeated-span detection — for every doc, how many
  // of its DISTINCT 8-token spans also occur in at least one OTHER doc
  // (the memorization-removal signal of Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better", approximated at the
  // fixed-length-gram granularity a shuffle engine handles natively
  // instead of a distributed suffix array). Unlike dc01 this is
  // corpus-vs-corpus, so neither side broadcasts; the scale shape is the
  // canonical two-exchange plan: per-doc-distinct gram hashes (computed
  // MAP-SIDE via array_distinct before the explode — no dedup shuffle),
  // one exchange to count docs per gram, one exchange to join the gram
  // stream back to the shared subset, then a tiny per-doc count. 60-bit
  // hashes mean ~8 bytes cross the wire per span, never the span text.
  // ---------------------------------------------------------------------
  private def distinctGramHashes(docs: DataFrame, n: Int): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val toks = expr("filter(split(norm, ' '), x -> x != '')")
    docs.select(col("doc_id"), norm.as("norm"))
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(expr(s"ngram_hashes(toks, $n)"))).as("gh"))
  }

  def dd10RepeatedSpans(s: SparkSession, dir: String): DataFrame = {
    val g = distinctGramHashes(Tables(s, dir, "documents"), 8)
    // g is per-doc distinct, so count(*) per gh IS the distinct doc count
    // and the final count(*) per doc IS the distinct shared-gram count —
    // both stay plain counts (map-side partial agg), no countDistinct
    // expansion anywhere.
    val shared = g.groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("gh"))
    g.join(shared, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  val dd10Oracle: String =
    s"""WITH nrm AS (
       | SELECT doc_id, list_filter(string_split(
       |   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
       |   ' '), x -> x != '') AS toks
       | FROM documents),
       |g AS (
       | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
       |   i -> ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))::BIGINT))) AS gh
       | FROM nrm),
       |shared AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2)
       |SELECT g.doc_id, COUNT(*) AS n_shared_grams
       |FROM g JOIN shared USING (gh)
       |GROUP BY g.doc_id""".stripMargin

  def dc01Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = gramHashes(Tables(s, dir, "documents"))
    // No pre-join distinct on the training side: the broadcast join filters
    // the corpus down to hit grams first, so the only shuffle in the plan
    // is the final per-doc count over hits (tiny). countDistinct de-dups
    // repeated grams within a doc at that point.
    val train = grams.filter(col("doc_id") % 97 =!= 0)
    val eval = grams.filter(col("doc_id") % 97 === 0)
      .select(col("gh")).distinct()
    train.join(broadcast(eval), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_hit_grams"))
  }

  /** DuckDB CTE pair `{name}_n, {name}` producing (doc_id, gh) 5-gram
    * hashes from `src` (a table name or aliased subquery with doc_id,
    * text) — the SQL twin of [[gramHashes]]. */
  private def gramSql(src: String, name: String): String =
    s"""${name}_n AS (
       | SELECT doc_id, list_filter(string_split(
       |   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
       |   ' '), x -> x != '') AS toks
       | FROM $src),
       |$name AS (
       | SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
       |   i -> ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))::BIGINT)) AS gh
       | FROM ${name}_n)""".stripMargin

  val dc01Oracle: String =
    s"""WITH ${gramSql("documents", "g")},
       |train AS (SELECT doc_id, gh FROM g WHERE doc_id % 97 != 0),
       |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0)
       |SELECT t.doc_id, COUNT(DISTINCT t.gh) AS n_hit_grams
       |FROM train t JOIN ev USING (gh)
       |GROUP BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // tp02: the complete training-data preparation pipeline, end to end in
  // one plan — quality gate → exact dedup → MinHash-LSH near-dup removal
  // (all via tp01) → benchmark-slice exclusion + 5-gram decontamination →
  // deterministic train/val/test split → per-language mixture sampling of
  // the train split. This is the "a user could run their whole curation
  // job on this engine" demonstration; every stage is the scale-shaped
  // variant (broadcast eval grams, hash-bucket splits, no corpus-side
  // pre-join shuffles beyond what dedup itself needs).
  // ---------------------------------------------------------------------
  def tp02FullCuration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val keep = docs
      .join(Dedup.tp01CorpusCuration(s, dir), Seq("doc_id"), "left_semi")
      .filter(col("doc_id") % 97 =!= 0) // the benchmark slice never trains
    val evalGrams = gramHashes(docs.filter(col("doc_id") % 97 === 0))
      .select(col("gh")).distinct()
    val contaminated = gramHashes(keep)
      .join(broadcast(evalGrams), Seq("gh"))
      .select(col("doc_id")).distinct()
    val rates = mixRates.toDF("lang", "keep_pct")
    keep.join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("bucket", hashBucket(col("text"), 100))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .withColumn("mixb", hashBucket(concat(lit("mix1:"), col("text")), 100))
      .join(broadcast(rates), Seq("lang"), "left")
      // mixture sampling applies to training data only; eval splits keep all
      .filter(col("split") =!= "train" ||
        col("mixb") < coalesce(col("keep_pct"), lit(100)))
      .select(col("doc_id"), col("lang"), col("split"))
  }

  val tp02Oracle: String = {
    val values = mixRates.map { case (l, p) => s"('$l', $p)" }.mkString(", ")
    s"""WITH ${Dedup.tp01Ctes},
       |keep AS (
       | SELECT d.doc_id, d.text, d.lang FROM documents d
       | JOIN tp01surv t ON d.doc_id = t.doc_id
       | WHERE d.doc_id % 97 != 0),
       |${gramSql("(SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0) _e", "evg")},
       |${gramSql("keep", "kg")},
       |contaminated AS (SELECT DISTINCT k.doc_id FROM kg k
       |  WHERE k.gh IN (SELECT gh FROM evg)),
       |r(lang, keep_pct) AS (VALUES $values),
       |sp AS (
       | SELECT doc_id, lang,
       |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
       |  ('0x' || substr(md5('mix1:' || text), 1, 8))::BIGINT % 100 AS mixb
       | FROM keep
       | WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
       |SELECT sp.doc_id, sp.lang,
       | CASE WHEN bucket < 80 THEN 'train'
       |      WHEN bucket < 90 THEN 'validation'
       |      ELSE 'test' END AS split
       |FROM sp LEFT JOIN r USING (lang)
       |WHERE bucket >= 80 OR mixb < COALESCE(r.keep_pct, 100)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // ds03: sequence packing — the GPT-style "concatenate the corpus in
  // doc_id order, cut every `budget` tokens" training-prep step. Each doc
  // gets its global token start offset, its training-sequence id, and a
  // straddles-boundary flag (the docs a packer would split or pad around).
  //
  // A global running sum is inherently order-serial, so the SCALE shape is
  // the classic two-phase distributed prefix sum: (1) order-preserving
  // buckets (doc_id ranges) are summed independently — map-side,
  // parallel; (2) the tiny per-bucket totals table gets an exclusive
  // prefix (window over ~corpus/B rows); (3) each doc's offset = its
  // bucket's prefix + a within-bucket cumsum (window PARTITIONED by
  // bucket — parallel again). No stage ever windows over the whole corpus
  // in one partition; the oracle runs the plain global window and must
  // match exactly.
  // ---------------------------------------------------------------------
  private val packBudget = 512L
  private val packBucketWidth = 256L

  def ds03SequencePack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n_tokens"),
      expr(s"doc_id div $packBucketWidth").as("bkt"))
    val bucketPrefix = toks.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("bsum"))
      .withColumn("bpre",
        coalesce(sum(col("bsum")).over(
          Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bkt"), col("bpre"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(bucketPrefix), Seq("bkt"))
      .withColumn("start_off",
        col("bpre") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .withColumn("seq_id", expr(s"start_off div $packBudget"))
      .withColumn("straddles",
        col("n_tokens") > 0 &&
          expr(s"(start_off + n_tokens - 1) div $packBudget") =!= col("seq_id"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("seq_id"), col("straddles"))
  }

  val ds03Oracle: String =
    s"""WITH t AS (
       | SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens
       | FROM documents),
       |c AS (
       | SELECT doc_id, n_tokens,
       |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
       | FROM t)
       |SELECT doc_id, n_tokens, start_off,
       | start_off // $packBudget AS seq_id,
       | (n_tokens > 0 AND (start_off + n_tokens - 1) // $packBudget != start_off // $packBudget) AS straddles
       |FROM c""".stripMargin

  val queries: Map[String, Q] = Map(
    "ds01_hash_split" -> (ds01HashSplit _),
    "ds02_stratified_sample" -> (ds02StratifiedSample _),
    "ds03_sequence_pack" -> (ds03SequencePack _),
    "dc01_decontaminate" -> (dc01Decontaminate _),
    "dd10_repeated_spans" -> (dd10RepeatedSpans _),
    "tp02_full_curation" -> (tp02FullCuration _))

  val oracles: Map[String, String] = Map(
    "ds01_hash_split" -> ds01Oracle,
    "ds02_stratified_sample" -> ds02Oracle,
    "ds03_sequence_pack" -> ds03Oracle,
    "dc01_decontaminate" -> dc01Oracle,
    "dd10_repeated_spans" -> dd10Oracle,
    "tp02_full_curation" -> tp02Oracle)
}
