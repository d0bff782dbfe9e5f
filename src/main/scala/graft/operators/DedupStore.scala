package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The persistent dedup store — the write path behind incremental dedup
  * (dd09). A production pipeline checks each day's crawl against the
  * accumulated corpus WITHOUT re-reading (let alone re-tokenizing) that
  * corpus: it maintains, on disk, exactly the three corpus-side inputs of
  * [[Dedup.incrementalFlags]] and rolls them forward with each accepted
  * increment. This is the Spark-scale form of the reference's
  * insert-conflict sink (`/root/reference/src/database.rs:99-110`): the
  * store IS the "already inserted" set, held as parquet instead of a
  * SQLite unique index.
  *
  * Layout under `dir`:
  *  - `hashes/` — (h: md5 hex of text). Exact-dup membership; append-only
  *    (duplicate h across roll-forwards is harmless — consumers only ever
  *    semi-join against it; a periodic compaction can rewrite it distinct).
  *  - `sets/`   — (doc_id, sh: array of word-trigram shingles). Feeds the
  *    exact-Jaccard verification of LSH candidates.
  *  - `bands/`  — (doc_id, k1, k2) partitioned by `band`. The LSH band
  *    keys; partitioning by band keeps each band's bucket file set
  *    self-contained, so a band-keyed join reads co-located files and a
  *    future bucket-pruned probe (one band at a time) scans 1/nBands of
  *    the store.
  *  - `bloom_hashes.bin` / `bloom_bands.bin` — megabyte-scale Bloom
  *    sidecars over `hashes` and the packed band keys, merged in place on
  *    each roll-forward. The incremental check broadcasts them and screens
  *    the new batch BEFORE either shuffle ([[Dedup.BloomPrefilter]]).
  *
  * Scale notes: `build` makes ONE tokenize+shingle pass over the corpus
  * (the sets are checkpointed, then hashes/bands derive from them);
  * `rollForward` touches ONLY the increment — the standing corpus is
  * never read, which at 100 TB is the entire point of the store.
  */
object DedupStore {

  final case class Store(hashes: DataFrame, sets: DataFrame, bands: DataFrame,
      blooms: Option[Dedup.BloomPrefilter] = None)

  /** Build (or rebuild) the store from a full corpus: one tokenize pass,
    * three parquet tables. */
  def build(docs: DataFrame, dir: String): Unit =
    write(docs, dir, overwrite = true)

  /** Append an ACCEPTED increment (docs that survived dedup) to the store.
    * Reads nothing from the existing store — the increment's own
    * hashes/sets/bands are computed and appended, so the cost is
    * O(increment), independent of corpus size. */
  def rollForward(dir: String, accepted: DataFrame): Unit =
    write(accepted, dir, overwrite = false)

  private def write(docs: DataFrame, dir: String, overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    // ONE tokenize+shingle pass: sets are materialized first, bands derive
    // from the checkpointed sets, and the hash table needs no tokens at all.
    val s = docs.sparkSession
    val sets = Dedup.shingleSets(docs).localCheckpoint()
    val hashes = docs.select(md5(col("text")).as("h")).distinct().localCheckpoint()
    val bands = Dedup.lshBands(Dedup.minhashSigsFromSets(sets).drop("sh"))
      .localCheckpoint()
    hashes.write.mode(mode).parquet(s"$dir/hashes")
    sets.write.mode(mode).parquet(s"$dir/sets")
    bands.write.mode(mode).partitionBy("band").parquet(s"$dir/bands")
    // Bloom sidecars: build-from-scratch on overwrite, merge-in-place on
    // roll-forward (same size constants everywhere → merge-compatible).
    val (fh, fb) = Dedup.BloomPrefilter.buildFilters(s, hashes, bands)
    val (bh, bb) =
      if (overwrite) (fh, fb)
      else readBloomFiles(s, dir) match {
        case Some((oh, ob)) =>
          oh.mergeInPlace(fh); ob.mergeInPlace(fb); (oh, ob)
        case None =>
          // No merge-compatible sidecars: a pre-version (v1) store, or a
          // store whose sidecar files were lost. Writing filters built
          // from the INCREMENT alone here would be the silent-dup trap:
          // later reads would trust them, the bloom screen drops
          // screened-out rows BEFORE the verifying joins, and every
          // standing member would become a false negative. Rebuild from
          // the FULL on-disk tables instead — the increment was already
          // appended above, so these scans cover standing + new. One
          // full pass, paid once per store upgrade/repair, never again.
          // band is a partition column on disk — pin it back to the INT
          // the in-memory probe side hashes (xxhash64 is type-sensitive,
          // so a type-inference drift here would silently change the
          // filter's key domain).
          Dedup.BloomPrefilter.buildFilters(s,
            s.read.parquet(s"$dir/hashes"),
            s.read.parquet(s"$dir/bands")
              .withColumn("band", col("band").cast("int")))
      }
    writeBloomFiles(s, dir, bh, bb)
  }

  private def fs(s: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), s.sparkContext.hadoopConfiguration)

  // Sidecar FORMAT VERSION, part of the file name: v2 keys the hash
  // filter on xxhash64(h) BIGINTs (the native-expression key domain)
  // where v1 inserted raw md5-hex strings. A v1 sidecar probed with v2
  // keys would PASS merges but MISS every pre-upgrade member — silent
  // duplicate admission — so v2 readers must never open v1 files:
  // versioned names make an old store read as "no sidecars" (screens
  // skipped, the verifying joins still correct, just unscreened) until
  // the next build/compact writes fresh v2 sidecars.
  private val BloomVersion = "v2"

  /** Bloom sidecars live next to the tables; writes go through a temp
    * name + rename so a crash leaves the previous readable pair. */
  private def writeBloomFiles(s: SparkSession, dir: String,
      bh: org.apache.spark.util.sketch.BloomFilter,
      bb: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val f = fs(s, dir)
    // Every v2 write retires the unversioned v1 names: v2 readers never
    // open them, so after the first v2 write they are dead megabyte-scale
    // files sitting next to the store forever. Idempotent, no-op once gone.
    for (legacy <- Seq("bloom_hashes.bin", "bloom_bands.bin"))
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/$legacy"), false)
    for ((name, filter) <- Seq(s"bloom_hashes_$BloomVersion" -> bh,
        s"bloom_bands_$BloomVersion" -> bb)) {
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.$name.tmp")
      val out = f.create(tmp, true)
      try filter.writeTo(out) finally out.close()
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$name.bin")
      f.delete(dst, false)
      f.rename(tmp, dst)
    }
  }

  private def readBloomFiles(s: SparkSession, dir: String)
      : Option[(org.apache.spark.util.sketch.BloomFilter,
                org.apache.spark.util.sketch.BloomFilter)] = {
    val f = fs(s, dir)
    def one(name: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.bin")
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
        finally in.close()
      }
    }
    for (h <- one(s"bloom_hashes_$BloomVersion");
         b <- one(s"bloom_bands_$BloomVersion")) yield (h, b)
  }

  def read(s: SparkSession, dir: String): Store = Store(
    s.read.parquet(s"$dir/hashes"),
    s.read.parquet(s"$dir/sets"),
    s.read.parquet(s"$dir/bands"),
    readBloomFiles(s, dir).map { case (h, b) =>
      Dedup.BloomPrefilter(s, h, b)
    })

  /** Periodic maintenance for an append-only store: collapse the duplicate
    * content hashes that accumulate across roll-forwards (appending each
    * increment's DISTINCT hashes still duplicates hashes already present)
    * and rewrite the file sets the small appends fragmented. Answers are
    * unchanged — consumers semi-join hashes and equi-join bands, both
    * multiplicity-insensitive... but a smaller hash table broadcasts where
    * a fragmented one shuffles. Runs table-at-a-time through a temp dir so
    * a crash mid-compact leaves the readable original in place. */
  def compact(s: SparkSession, dir: String): Unit = {
    val parallelism = s.sparkContext.defaultParallelism
    def rewrite(table: String, df: DataFrame, partitionCols: Seq[String]): Unit = {
      val tmp = s"$dir/.compact_$table"
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$table")
      fs.delete(dst, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    }
    rewrite("hashes",
      s.read.parquet(s"$dir/hashes").distinct().repartition(parallelism), Seq.empty)
    rewrite("sets",
      s.read.parquet(s"$dir/sets").repartition(parallelism), Seq.empty)
    // Repartition ON the band column so each band's rows land in one task:
    // the rewrite restores ONE file per band partition no matter how many
    // roll-forwards fragmented it. (At sizes where a single band outgrows
    // one task, add a second split key here — the partition layout and its
    // consumers don't change.)
    rewrite("bands",
      s.read.parquet(s"$dir/bands").repartition(col("band")), Seq("band"))
    // Rebuild the bloom sidecars from the compacted tables — same content
    // (blooms have no deletes to lose), but derived from one source of
    // truth instead of a merge chain.
    val (rh, rb) = Dedup.BloomPrefilter.buildFilters(s,
      s.read.parquet(s"$dir/hashes"), s.read.parquet(s"$dir/bands"))
    writeBloomFiles(s, dir, rh, rb)
  }

  /** dd09's check with the corpus side READ FROM THE STORE — the plan the
    * daily job actually runs: the old side is three parquet scans (no
    * split/minhash anywhere on it), the new side is tokenized once and
    * bloom-screened against the persisted sidecars before either shuffle
    * (when the store has them — older stores without sidecars still
    * answer identically, just without the pre-filter). */
  def incrementalAgainstStore(neu: DataFrame, store: Store): DataFrame =
    Dedup.incrementalFlags(neu, store.hashes, store.sets, store.bands, store.blooms)

  /** Deterministic scratch location for a given input dir (the driver runs
    * each query as a pure (session, sfDir) function — the store location
    * must derive from the input, not from mutable state). */
  private[operators] def storePathFor(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_dedup_store_$tag"
  }

  // ---------------------------------------------------------------------
  // dd11: the full nightly cycle — (re)build the store from the standing
  // corpus, then run the incremental check READING it. Same split and same
  // answer as dd09 (the oracle is shared), but the corpus side of the
  // check plan is pure parquet scans; the recompute that dd09 performs
  // in-memory is here the explicit, amortizable build job. The timed cost
  // of this query = store build + store-backed check; at 100 TB only the
  // check runs per increment.
  // ---------------------------------------------------------------------
  def dd11StoreIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 10 < 8)
    val neu = docs.filter(col("doc_id") % 10 >= 8)
    val storeDir = storePathFor(dir)
    build(old, storeDir)
    incrementalAgainstStore(neu, read(s, storeDir))
  }

  val queries: Map[String, Relational.Q] = Map(
    "dd11_store_incremental" -> (dd11StoreIncremental _))

  // Same semantics as dd09, so the same oracle must hash-match.
  val oracles: Map[String, String] = Map(
    "dd11_store_incremental" -> Dedup.dd09Oracle)
}
