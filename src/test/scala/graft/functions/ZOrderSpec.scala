package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the Morton/Z-order key: golden values, agreement with an
  * independent bit-by-bit reference, the locality property that makes it a
  * layout tool (aligned power-of-2 squares are CONTIGUOUS key ranges), and
  * the clustered-write shape (range-partitioned files cover disjoint key
  * ranges → parquet min/max stats can prune both dimensions). */
class ZOrderSpec extends SparkSpec {

  /** Independent reference: interleave bit i of x to position 2i, bit i of
    * y to 2i+1 — the definition, one bit at a time (the production code
    * uses parallel-prefix masks). */
  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("golden values and agreement with the bit-by-bit reference") {
    // hand-derived: x=0b11 (bits 0,1 -> pos 0,2), y=0b01 (bit 0 -> pos 1)
    assert(ZOrderImpl.compute(3L, 1L) == 7L)
    assert(ZOrderImpl.compute(0L, 0L) == 0L)
    assert(ZOrderImpl.compute(1L, 0L) == 1L)
    assert(ZOrderImpl.compute(0L, 1L) == 2L)
    assert(ZOrderImpl.compute(0x7fffffffL, 0L) == 0x1555555555555555L)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & 0x7fffffffL
      val y = rnd.nextLong() & 0x7fffffffL
      assert(ZOrderImpl.compute(x, y) == ref(x, y), s"($x, $y)")
    }
    // out-of-range inputs mask to the low 31 bits (documented)
    assert(ZOrderImpl.compute(-1L, 0L) == ZOrderImpl.compute(0x7fffffffL, 0L))
  }

  test("SQL expression evaluates via codegen and matches the reference") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i % 37, i % 53)).toDF("x", "y")
      .selectExpr("x", "y", "zorder2(x, y) AS z").collect()
    for (r <- rows)
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)))
  }

  test("every aligned 8x8 square of a 64x64 grid is one contiguous key range") {
    // THE property that makes Z-order a pruning layout: a rectangle
    // predicate aligned to a power-of-2 square touches one contiguous run
    // of keys, so files/row-groups sorted by zkey skip everything else.
    for (bx <- 0 until 8; by <- 0 until 8) {
      val keys = for (x <- 0 until 8; y <- 0 until 8)
        yield ZOrderImpl.compute(bx * 8L + x, by * 8L + y)
      val sorted = keys.sorted
      assert(sorted.last - sorted.head == 63L,
        s"block ($bx,$by) spans ${sorted.head}..${sorted.last}")
      assert(sorted.distinct.size == 64)
    }
  }

  test("zRanges: ascending disjoint intervals covering every key in the rectangle") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      val xLo = rnd.nextInt(60); val xHi = xLo + rnd.nextInt(64 - xLo)
      val yLo = rnd.nextInt(60); val yHi = yLo + rnd.nextInt(64 - yLo)
      val ranges = ZOrderImpl.zRanges(xLo, xHi, yLo, yHi, maxRanges = 64)
      assert(ranges.nonEmpty && ranges.size <= 64)
      for (Seq((_, h1), (l2, _)) <- ranges.sliding(2))
        assert(h1 + 1 < l2, s"not ascending-disjoint-coalesced: $ranges")
      // every key inside the rectangle is covered (the pruning contract)
      for (x <- xLo to xHi; y <- yLo to yHi) {
        val z = ZOrderImpl.compute(x, y)
        assert(ranges.exists { case (lo, hi) => lo <= z && z <= hi },
          s"($x,$y) z=$z escapes [$xLo,$xHi]x[$yLo,$yHi] -> $ranges")
      }
    }
    // aligned power-of-2 square = exactly one contiguous range, no slop
    assert(ZOrderImpl.zRanges(16, 23, 8, 15) ==
      Seq((ZOrderImpl.compute(16, 8), ZOrderImpl.compute(16, 8) + 63)))
  }

  test("zRanges: budget bounds the range count on huge rectangles, still covering") {
    // a worst-case thin diagonal-ish rectangle over the full 31-bit domain
    val ranges = ZOrderImpl.zRanges(12345L, 2000000000L, 777L, 1999999999L,
      maxRanges = 16)
    assert(ranges.size <= 16)
    for (Seq((_, h1), (l2, _)) <- ranges.sliding(2)) assert(h1 < l2)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 5000) {
      val x = 12345L + (math.abs(rnd.nextLong()) % (2000000000L - 12345L + 1))
      val y = 777L + (math.abs(rnd.nextLong()) % (1999999999L - 777L + 1))
      val z = ZOrderImpl.compute(x, y)
      assert(ranges.exists { case (lo, hi) => lo <= z && z <= hi })
    }
  }

  test("zRectScan: rectangle answer identical to the plain x/y filter, and prunes files on BOTH dimensions") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zorder-read").toFile
    try {
      val rnd = new scala.util.Random(11)
      val df = (1 to 8000).map(i =>
        (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
        .toDF("id", "x", "y")
      graft.operators.Curation.zorderClustered(df, "x", "y", 16)
        .write.mode("overwrite").parquet(tmp.getPath)
      val t = spark.read.parquet(tmp.getPath)
      val total = t.select(input_file_name()).distinct().count()
      assert(total > 8)
      // correctness: the rewrite changes WHICH FILES are opened, never rows
      val got = graft.operators.Curation
        .zRectScan(t, "x", "y", 100, 180, 600, 700)
        .select("id").as[Long].collect().sorted
      val want = t.filter(col("x").between(100, 180) && col("y").between(600, 700))
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want) && got.nonEmpty)
      // pruning: the files the z-ranges ADMIT (zPred alone, before the
      // exact x/y predicates) are a strict subset of all files — this is
      // what footer min/max stats skip. Check a rectangle thin in x and
      // one thin in y: both dimensions prune through the one zkey column.
      def admitted(xLo: Long, xHi: Long, yLo: Long, yHi: Long): Long = {
        val ranges = ZOrderImpl.zRanges(xLo, xHi, yLo, yHi, 64)
        val zPred = ranges.map { case (lo, hi) => col("zkey").between(lo, hi) }
          .reduce(_ || _)
        t.filter(zPred).select(input_file_name()).distinct().count()
      }
      val thinX = admitted(0, 30, 0, 1023)
      val thinY = admitted(0, 1023, 0, 30)
      assert(thinX < total, s"x-thin rectangle admitted all $total files")
      assert(thinY < total, s"y-thin rectangle admitted all $total files")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("zorderClustered writes range-disjoint files — min/max stats prune rectangles") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zorder-layout").toFile
    try {
      val rnd = new scala.util.Random(7)
      val df = (1 to 4000).map(_ =>
        (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)).toDF("x", "y")
      graft.operators.Curation.zorderClustered(df, "x", "y", 8)
        .write.mode("overwrite").parquet(tmp.getPath)
      // per-file [min, max] zkey ranges must be pairwise disjoint: that is
      // exactly what lets a zkey-range predicate skip files via footer stats
      val ranges = spark.read.parquet(tmp.getPath)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.length > 1)
      for (Seq((_, hi1), (lo2, _)) <- ranges.toSeq.sliding(2))
        assert(hi1 <= lo2, s"overlapping file ranges: $ranges")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }
}
