package graft.operators

import graft.SparkSpec

/** Plan-shape regression tests: the physical properties that matter at
  * 100 TB must survive refactors — filter pushdown to the parquet scan,
  * column pruning, and broadcast joins for the small dimensions. */
class PlanShapeSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q01: shipdate filter reaches the scan; unused columns pruned") {
    val plan = Relational.q01PricingAgg(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), plan.take(2000))
    // 6 of 11 lineitem columns are needed; the scan schema must not list tax
    assert(!plan.contains("l_tax"), "l_tax should be pruned from the scan")
  }

  test("q12: nation and region join as broadcasts") {
    val plan = Relational.q12RevenueByRegion(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q08: prefix theta-join stays hash-joinable (no nested loop)") {
    val plan = Relational.q08PrefixLangJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  // The dedup/ANN SCALE path must never route through an all-pairs join.
  // dd06/ss01 are the documented exact baselines (cartesian by construction)
  // and stay exempt; these guards pin the plans a 100 TB run would use.
  test("dd07: composed dedup pipeline is NLJ/cartesian-free") {
    val plan = Dedup.dd07DedupPipeline(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("ss02: LSH ANN is NLJ/cartesian-free and codegen-bucketed") {
    val df = Similarity.ss02AnnLsh(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the bucket signature must be the native expression, not the
    // interpreted nested-aggregate HOF
    assert(plan.contains("lsh_bucket"), plan.take(2000))
  }

  test("dd08: bucketed embedding near-dup is NLJ/cartesian-free") {
    val plan = Dedup.dd08EmbNeardupLsh(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("lsh_bucket"), plan.take(2000))
  }

  test("dd09: incremental dedup joins new-vs-old bands only, NLJ/cartesian-free") {
    val plan = Dedup.dd09IncrementalDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // exact membership against the corpus must stay a semi join
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }

  test("tp01: curation pipeline is NLJ/cartesian-free") {
    val plan = Dedup.tp01CorpusCuration(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q30: interval-join attribution stays hash-joinable") {
    val plan = EventOps.q30Attribution(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("max_by"), plan.take(2000))
  }

  test("dd05: size(array_intersect) is rewritten to native intersect_size") {
    val plan = Dedup.dd05JaccardVerify(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("intersect_size"), plan.take(2000))
    assert(!plan.contains("array_intersect"), plan.take(2000))
  }

  test("ss03: IVF assignment aggregates (no window over corpus×centroids)") {
    val plan = Similarity.ss03AnnIvf(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan.take(2000))
  }

  test("q32: as-of join compiles to a single window pass — no join operator") {
    val plan = EventOps.q32AsofJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("ds01/ds02: split and mixture sampling shuffle nothing on the corpus side") {
    // ds01 is a pure projection: no exchange at all.
    val p1 = Curation.ds01HashSplit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), p1.take(2000))
    // ds02's only exchange is the broadcast of the 5-row rate table.
    val p2 = Curation.ds02StratifiedSample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), p2.take(2000))
    assert(!p2.contains("ShuffleExchange"), p2.take(2000))
  }

  test("tp02: full curation pipeline is NLJ/cartesian-free; config dims broadcast") {
    val plan = Curation.tp02FullCuration(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("ds09: epoch-shard rank is (shard,bkt)-partitioned (no per-shard corpus sort)") {
    val plan = Curation.ds09EpochShards(spark, dir)
      .queryExecution.executedPlan.toString
    // the within-bucket row_number must run inside (shard, bkt) slices —
    // a window partitioned by shard alone would sort corpus/nShards rows
    // through single tasks at 100 TB
    assert(plan.contains("hashpartitioning(shard"), plan.take(3000))
    assert(plan.contains("bkt"), plan.take(3000))
    // the per-shard bucket-prefix table (nShards × nBuckets rows) broadcasts
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("ds03: packing's corpus window is bucket-partitioned (no global sort)") {
    val plan = Curation.ds03SequencePack(spark, dir)
      .queryExecution.executedPlan.toString
    // the per-doc cumsum must run inside bkt partitions — a plan whose
    // corpus-side window lost its partition spec would serialize the
    // whole corpus through one task at 100 TB
    assert(plan.contains("hashpartitioning(bkt"), plan.take(3000))
    // the bucket-prefix table (corpus/256 rows) joins in as a broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("ss05: indexed ANN reads lists from parquet, never re-assigns") {
    val plan = Similarity.ss05AnnIvfIndexed(spark, dir)
      .queryExecution.executedPlan.toString
    // assignment (the max_by argmax) belongs to the index BUILD only —
    // its presence here would mean the query path recomputes the index
    assert(!plan.contains("max_by"), plan.take(3000))
    assert(plan.contains("graft_ivf_index"),
      "probe side must scan the on-disk index\n" + plan.take(3000))
  }

  test("ss08: multi-probe stays bucket-equi-joined and beats single-probe recall") {
    val plan = Similarity.ss08AnnMultiprobe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the whole point of probing the 8 Hamming-1 buckets: strictly more
    // of the exact top-k recovered than the single-bucket tier
    import org.apache.spark.sql.functions.col
    val exact = Similarity.ss01BruteTopk(spark, dir)
      .select(col("q_id"), col("c_id"))
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      exact.join(df.select(col("q_id"), col("c_id")), Seq("q_id", "c_id")).count()
    val single = hits(Similarity.ss02AnnLsh(spark, dir))
    val multi = hits(Similarity.ss08AnnMultiprobe(spark, dir))
    assert(multi >= single, s"multi-probe recall $multi < single-probe $single")
    assert(multi > 0)
  }

  test("cc02: star-contraction components stay NLJ/cartesian-free") {
    val plan = Dedup.cc02DupComponentsStar(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("dd11: store-backed incremental check never tokenizes the corpus") {
    val plan = graft.operators.DedupStore.dd11StoreIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("split("), plan.take(3000))
    assert("minhash_sigs".r.findAllMatchIn(plan).size == 1, // new side only
      plan.take(3000))
    assert(plan.contains("graft_dedup_store"), plan.take(3000))
  }

  test("dc01: decontamination broadcasts the eval grams; corpus side shuffles only hits") {
    val df = Curation.dc01Decontaminate(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the only hash exchanges allowed: the tiny eval-side distinct plus the
    // two-phase distinct-count over hit grams. The full corpus gram stream
    // reaches the broadcast join with no exchange beneath it — any fourth
    // exchange means someone reintroduced a corpus-side pre-join shuffle.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"expected <=3 hash exchanges, got $shuffles\n" + plan.take(3000))
  }

  test("ds05: budget cumsum windows are (lang, bkt)-partitioned — no per-lang serial scan") {
    val plan = Curation.ds05TokenBudget(spark, dir)
      .queryExecution.executedPlan.toString
    // the corpus-side window must keep its bucket partitioning; losing it
    // would serialize each language through one task at 100 TB
    assert(plan.contains("hashpartitioning(lang"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("dd13: paragraph dedup is NLJ/cartesian-free with a min-struct winner agg") {
    val plan = Curation.dd13ParagraphDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // winner per chunk hash must stay a codegen'd HASH aggregate (map-side
    // partial — skew-proof): never a row_number window over the chunk
    // stream, and never the SortAggregate fallback that a struct-keyed
    // min/min_by would plan (the packed-BIGINT key is what prevents it)
    assert(plan.contains("HashAggregate"), plan.take(3000))
    assert(!plan.contains("SortAggregate"), plan.take(3000))
    assert(!plan.contains("row_number"), plan.take(3000))
  }

  test("tx10: BPE pair mining tops out via TakeOrderedAndProject, not a global sort") {
    val plan = TextOps.tx10BpePairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("ds06: zorder key is the native expression and shuffles nothing") {
    val plan = Curation.ds06ZorderKey(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("zorder2"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("q36: cube computes all grouping sets in one Expand pass (one scan)") {
    val plan = Relational.q36Cube(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(2000))
    assert("FileScan".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("ds07: rank limit pushes below the shuffle (WindowGroupLimit)") {
    val plan = Curation.ds07GroupSample(spark, dir)
      .queryExecution.executedPlan.toString
    // the rn <= k filter must become a partial per-map-task top-k, so the
    // exchange ships ~k rows per stratum instead of the whole corpus
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("tp03: corpus report is NLJ/cartesian-free; vocab joins as a broadcast") {
    val plan = Curation.tp03CorpusReport(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q37: interval join stays hash-joinable (time bound is residual)") {
    val plan = EventOps.q37IntervalJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("ds10: mixture rates broadcast back; one corpus-side hash exchange") {
    val plan = Curation.ds10TempMixture(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // both hash exchanges live inside the |langs|-row rate-table build
    // (token-count agg + weight normalization) — the corpus stream itself
    // must reach the broadcast join with no exchange: nothing in the plan
    // may partition on the per-doc key
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected <=2 hash exchanges, got $shuffles\n" + plan.take(3000))
    assert(!plan.contains("hashpartitioning(doc_id"), plan.take(3000))
  }

  test("dc02: leak report screens training grams by broadcast before any shuffle") {
    val plan = Curation.dc02ContaminationReport(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("tx15: per-doc top-3 terms push a partial WindowGroupLimit below the exchange") {
    val plan = TextOps.tx15Tfidf(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("tx16: percentile walk runs over the histogram, windowed per language") {
    val plan = TextOps.tx16LengthPercentiles(spark, dir)
      .queryExecution.executedPlan.toString
    // the cumulative window partitions by lang over the DICTIONARY (post-
    // aggregate); the corpus contributes only the histogram partial-agg.
    assert(plan.contains("hashpartitioning(lang"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ss10: ADC scan is one map-side pass — no join on the corpus code side") {
    val plan = Similarity.ss10PqAdc(spark, dir)
      .queryExecution.executedPlan.toString
    // the candidate × query scoring must be the broadcast LUT cross join
    // (tiny side), never a shuffled join of the corpus code table
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("ss17: SQ scan attaches stats and queries by broadcast only") {
    val plan = Similarity.ss17SqTopk(spark, dir)
      .queryExecution.executedPlan.toString
    // per-dim stats (64 rows) and the query set both broadcast; the code
    // table itself must never be the build or shuffle side of a join
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("tx18: vocab growth has no threshold theta-join and no corpus-wide window") {
    val plan = TextOps.tx18VocabGrowth(spark, dir)
      .queryExecution.executedPlan.toString
    // token→bucket is a projection; the only window runs over the
    // ≤|thresholds|-row bucket counts
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ds13: curriculum never sorts the corpus globally") {
    val plan = Curation.ds13Curriculum(spark, dir)
      .queryExecution.executedPlan.toString
    // phase lookup + bucket prefix broadcast back; rows sort only within
    // their (phase, bucket) slice — a rangepartitioning over the full
    // corpus would mean a global sort snuck in
    assert(!plan.contains("rangepartitioning"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q48: lateral subquery decorrelates — no per-row nested loop") {
    // The whole point of shipping LATERAL syntax: Catalyst must rewrite
    // the correlated ORDER BY ... LIMIT 3 into a join + partitioned
    // window. A CartesianProduct/NLJ here would mean the per-row
    // subquery survived to execution — unusable at scale.
    val plan = Relational.q48Lateral(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("WindowGroupLimit") || plan.contains("Window"),
      plan.take(3000))
  }

  test("cc05: pagerank iterations re-shuffle ranks, never the edge table") {
    // The degree-annotated edge table is checkpointed hash-partitioned on
    // src; each iteration's join must reuse that layout (no Exchange on
    // the edge side of the join). A rough but effective proxy: the final
    // plan (one iteration deep, thanks to per-iteration checkpoints) has
    // no more than the two expected exchanges (rank-side repartition +
    // contribution aggregate).
    val plan = Dedup.cc05PageRank(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n" +
      plan.take(3000))
  }

  test("q50: skyline is the windowed sweep — no quadratic dominance self-join") {
    val plan = Relational.q50Skyline(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("ds17: priority sample head is TakeOrdered over per-row arithmetic — no global sort") {
    val plan = Curation.prioHead(graft.Tables(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("rangepartitioning"),
      "a full range-partitioned sort snuck into the sample:\n" + plan.take(3000))
  }

  test("dd17: SNM corpus rank window is bucket-partitioned; pairing stays equi-join") {
    // corpus-side row_number must carry the bkt partition key — an empty
    // partition spec would serialize the whole corpus through one task
    val rankPlan = Dedup.snmRanked(graft.Tables(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    assert(rankPlan.contains("hashpartitioning(bkt"), rankPlan.take(3000))
    assert(!rankPlan.contains("rangepartitioning"), rankPlan.take(3000))
    val plan = Dedup.dd17SortedNeighborhood(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q53: both running-distinct windows share ONE user_id exchange") {
    val plan = EventOps.q53RunningDistinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one hash exchange, plan:\n${plan.take(3000)}")
    assert("Window".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q54: median/mode never plan a sort-based percentile over the corpus") {
    val plan = Relational.q54MedianMode(spark, dir)
      .queryExecution.executedPlan.toString
    // everything order-sensitive happens on the ≤|groups·values| histogram
    assert(!plan.contains("percentile"), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("dc04: chunk decontamination screens via broadcast, corpus unshuffled pre-join") {
    val plan = Curation.dc04ChunkDecontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dd25: sparse cosine join is NLJ/cartesian-free (posting-list dataflow)") {
    val plan = Dedup.dd25CosinePairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("tx27: deletion-neighborhood join is NLJ/cartesian-free (never the |V|^2 matrix)") {
    val plan = TextOps.tx27Edit1Pairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("tx27: levenshtein <= k is rewritten to the bounded threshold form") {
    val plan = TextOps.tx27Edit1Pairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Some(1)) >= 0"), plan.take(3000))
    // and the rewrite preserves values on every comparison shape
    import spark.implicits._
    val df = Seq(("abc", "abd"), ("abc", "xyz"), ("abc", "abc"), ("abc", "abcd"))
      .toDF("a", "b")
    val got = df.selectExpr(
      "levenshtein(a, b) <= 1", "levenshtein(a, b) < 2",
      "levenshtein(a, b) > 1", "levenshtein(a, b) >= 2",
      "1 >= levenshtein(a, b)").collect()
      .map(r => (0 until 5).map(r.getBoolean).toSeq)
    val want = Seq(
      Seq(true, true, false, false, true),    // ed 1
      Seq(false, false, true, true, false),   // ed 3
      Seq(true, true, false, false, true),    // ed 0
      Seq(true, true, false, false, true))    // ed 1
    assert(got.toSeq === want)
  }

  test("geo09: rectangle join meets in grid cells, never the cross product") {
    val plan = Geo.geo09RectJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dd26: winnowing pair join is NLJ/cartesian-free") {
    val plan = Dedup.dd26Winnowing(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q74: basket mining self-join stays hash-keyed on the order id") {
    val plan = Relational.q74AssocRules(spark, dir)
      .queryExecution.executedPlan.toString
    // the items self-join and both support joins must be hash joins; the
    // one nested-loop node is the 1-row scalar N attach (cross with a
    // single-row broadcast — the correct shape for a scalar)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("q70: bitmap overlap joins words hash-wise, no single-partition exchange") {
    val plan = EventOps.q70AudienceOverlap(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    // the per-type bitmap tables join on word index — corpus rows never
    // funnel through a SinglePartition window/sort
    assert(!plan.contains("SinglePartition"), plan.take(3000))
  }

  test("ss36: NSW beam search is cartesian-free; frontier joins stay hashed") {
    // the one deliberate product is queries × entry points — a broadcast
    // of nswEntryCount ids, constant-size at any corpus scale. The hot
    // joins (frontier→edges, frontier→vector table) must stay equi-hash.
    // Inspect the LAZY pipeline at ONE hop: the production path's
    // per-hop localCheckpoints collapse the plan to a LogicalRDD scan
    // (a plan assert against it would be vacuous), and without
    // checkpoints the frontier tree doubles per hop — b feeds both
    // branches of the grow union — so each extra hop doubles the copies
    // of the one deliberate entry product in the plan text.
    val plan = Similarity
      .nswBeamPipeline(spark, dir, materialize = false, hops = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // round 8: serving reads the PERSISTED graph — the edge subtree must
    // be a parquet index scan, and the ranked-edge build (knnRankedEdges
    // + its IVF probe products, 2 NLJs in the round-7 in-query plan) must
    // be GONE from the serving plan entirely. One hop duplicates the
    // initial frontier twice → ≤2 copies of the one deliberate product
    // left: queries × broadcast entry points (constant-size).
    assert(plan.contains("graft_ivf_index"),
      "serving must scan the stored index files\n" + plan.take(3000))
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj <= 2, s"expected only the entry-point product, got $nlj\n" +
      plan.take(3000))
  }

  test("ss40/ss42/ss45: the round-7 serving family keeps scale-critical plans") {
    // The per-hop pipelines are checkpointed in production, so inspect
    // the EXECUTED plans of the materialized queries: the invariant that
    // must hold at any corpus size is that the label joins, the visited
    // re-score joins and the tombstone screens are all EQUI-joins or
    // map-side filters — never a cartesian. (The beam interior is pinned
    // by the ss36 lazy-path test above; these run the real thing.)
    for ((name, df) <- Seq(
        "ss40" -> Similarity.ss40FilteredNswBeam(spark, dir),
        "ss42" -> Similarity.ss42NswTombstoned(spark, dir),
        "ss45" -> Similarity.ss45PerLabelNsw(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name:\n" + plan.take(3000))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name: the post-checkpoint tail must be pure equi-join/filter\n" +
          plan.take(3000))
    }
  }
}
