package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted NSW graph index's contract (round 8 — VERDICT r7 #1):
  * (1) the stored edge table is bit-identical to the in-query ranked-edge
  * build the oracles pin, so serving from disk cannot drift from the
  * oracle-checked semantics; (2) appendToNswIndex's O(increment) pieces
  * land on the same graph a one-shot probe of the grown index computes;
  * (3) entries are maintained incrementally yet equal the global minimum;
  * (4) tombstone/compact round-trip: the compacted artifact contains no
  * dead nodes and starts with a clean tombstone set; (5) the per-label
  * artifact partition-prunes a single-label probe — the at-scale form of
  * the pre-filter strategy ss45 measures. */
class NswIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmpIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  private def edgeRows(idx: String, maxRnk: Int = Int.MaxValue) =
    spark.read.parquet(s"$idx/edges").filter(col("rnk") <= maxRnk)
      .select(col("src"), col("dst"), col("rnk").cast("int"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toList.sorted

  test("stored edges equal the in-query ranked-edge build (build/serve law)") {
    val base = Similarity.qvec(spark, dir).localCheckpoint()
    val idx = tmpIdx("nsw-build")
    try {
      Similarity.buildNswIndex(spark, base, idx)
      val inQuery = Similarity.knnRankedEdges(spark, base)
        .select(col("src"), col("dst"), col("rnk").cast("int"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toList.sorted
      assert(edgeRows(idx) == inQuery,
        "stored edges drifted from the oracle-pinned in-query build")
      // entry points: the stored table IS the lowest-ids rule
      val stored = spark.read.parquet(s"$idx/entries")
        .collect().map(_.getLong(0)).toList.sorted
      val expected = base.select(col("vec_id")).orderBy(col("vec_id").asc)
        .limit(stored.size).collect().map(_.getLong(0)).toList.sorted
      assert(stored == expected)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(idx).getParentFile)
  }

  test("append lands on the one-shot graph over the grown index (frozen quantizer)") {
    val base = Similarity.qvec(spark, dir).localCheckpoint()
    val standing = base.filter(col("vec_id") % 10 =!= 3)
    val inc = base.filter(col("vec_id") % 10 === 3)
    val idx = tmpIdx("nsw-append")
    try {
      Similarity.buildNswIndex(spark, standing, idx)
      Similarity.appendToNswIndex(spark, idx, inc)
      // ground truth at the analysis degree: probe the GROWN stored IVF
      // (standing-trained centroids, full lists) with every vector — the
      // same frozen-quantizer one-shot the ss38 oracle computes
      val oneShot = Similarity.oneShotGraph(spark, base, s"$idx/ivf")
        .select(col("src"), col("dst"), col("rnk").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toList.sorted
      val rolled = spark.read.parquet(s"$idx/edges").filter(col("rnk") <= 3)
        .select(col("src"), col("dst"), col("rnk").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toList.sorted
      assert(rolled == oneShot,
        "rolled-forward edges drifted from the one-shot grown-index graph")
      // incremental entry maintenance equals the global minimum
      val stored = spark.read.parquet(s"$idx/entries")
        .collect().map(_.getLong(0)).toList.sorted
      val globalMin = base.select(col("vec_id")).orderBy(col("vec_id").asc)
        .limit(stored.size).collect().map(_.getLong(0)).toList.sorted
      assert(stored == globalMin)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(idx).getParentFile)
  }

  test("tombstone + compact: dead nodes gone from edges/entries, tombstones reset") {
    val base = Similarity.qvec(spark, dir).localCheckpoint()
    val idx = tmpIdx("nsw-tomb")
    val idxC = tmpIdx("nsw-compact")
    try {
      Similarity.buildNswIndex(spark, base, idx)
      val dead = base.filter(col("vec_id") % 9 === 0).select(col("vec_id"))
      Similarity.tombstoneNswIndex(spark, idx, dead)
      Similarity.tombstoneNswIndex(spark, idx, dead) // idempotent
      val nDead = dead.count()
      assert(Similarity.storedNswTombstones(spark, idx).count() == nDead)
      // the standing graph keeps routing through dead nodes (edges untouched)
      assert(spark.read.parquet(s"$idx/edges")
        .filter(col("src") % 9 === 0).count() > 0)
      Similarity.compactNswIndex(spark, base, idx, idxC)
      val ce = spark.read.parquet(s"$idxC/edges")
      assert(ce.filter(col("src") % 9 === 0 || col("dst") % 9 === 0).count() == 0,
        "compacted edges must not touch dead nodes")
      assert(spark.read.parquet(s"$idxC/entries")
        .filter(col("vec_id") % 9 === 0).count() == 0)
      assert(Similarity.storedNswTombstones(spark, idxC).count() == 0,
        "a compacted artifact starts with a clean tombstone set")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idx).getParentFile)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxC).getParentFile)
    }
  }

  test("append is replay-convergent per tag (streaming at-least-once contract)") {
    val base = Similarity.qvec(spark, dir).localCheckpoint()
    val standing = base.filter(col("vec_id") % 10 =!= 3)
    val inc = base.filter(col("vec_id") % 10 === 3)
    val idxA = tmpIdx("nsw-replay")
    val idxB = tmpIdx("nsw-once")
    try {
      Similarity.buildNswIndex(spark, standing, idxA)
      Similarity.buildNswIndex(spark, standing, idxB)
      // simulate at-least-once delivery: the SAME logical batch (same tag)
      // lands twice on A — a crash after the full append but before the
      // streaming sink's commit marker, then redelivery — and once on B
      Similarity.appendToNswIndex(spark, idxA, inc, "b3")
      Similarity.appendToNswIndex(spark, idxA, inc, "b3")
      Similarity.appendToNswIndex(spark, idxB, inc, "b3")
      def lists(i: String) = spark.read.parquet(s"$i/ivf/lists")
        .select(col("vec_id")).collect().map(_.getLong(0)).toList.sorted
      assert(lists(idxA) == lists(idxB),
        "replayed list append must converge to one copy per row")
      assert(edgeRows(idxA) == edgeRows(idxB),
        "replayed edge merge must converge to the single-append graph")
      val entA = spark.read.parquet(s"$idxA/entries")
        .collect().map(_.getLong(0)).toList.sorted
      val entB = spark.read.parquet(s"$idxB/entries")
        .collect().map(_.getLong(0)).toList.sorted
      assert(entA == entB)
      // the marker-gated streaming body: a committed batchId is a no-op
      // even with different data (the marker, not the content, gates)
      graft.streaming.EventStream.ingestGraphBatch(
        graft.Tables(spark, dir, "embeddings")
          .filter(col("vec_id") % 10 === 3)
          .select(col("vec_id"), col("label"), col("embedding")), idxA, 7L)
      val before = edgeRows(idxA)
      graft.streaming.EventStream.ingestGraphBatch(
        graft.Tables(spark, dir, "embeddings")
          .filter(col("vec_id") % 10 === 3)
          .select(col("vec_id"), col("label"), col("embedding")), idxA, 7L)
      assert(edgeRows(idxA) == before,
        "a committed batchId must be a no-op on replay")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxA).getParentFile)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxB).getParentFile)
    }
  }

  test("per-label artifact partition-prunes a single-label probe") {
    val idxL = tmpIdx("nsw-label")
    try {
      Similarity.buildPerLabelNswIndex(spark, dir, idxL)
      val edges = spark.read.parquet(s"$idxL/edges")
      // partition-type inference may read the label partition back as a
      // different type than it was written with — compare on the raw value
      val one = edges.select(col("label")).limit(1).collect()(0).get(0)
      val plan = edges.filter(col("label") === one)
        .queryExecution.executedPlan
      val scan = plan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      assert(scan.partitionFilters.exists(_.toString.contains("label")),
        s"label predicate must prune partitions: ${scan.partitionFilters}")
      val all = edges.select(input_file_name()).distinct().count()
      val pruned = edges.filter(col("label") === one)
        .select(input_file_name()).distinct().count()
      assert(pruned < all && pruned > 0, s"pruned=$pruned all=$all")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(idxL).getParentFile)
  }
}
