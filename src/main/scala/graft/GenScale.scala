package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N corpus amplifier for scaling-decade measurements
  * (round-13 verdict #2: the 100× claims rested on sf0.01→sf0.1 ratios
  * plus plan pins; the driver ships nothing past sf0.1). Replicates a
  * driver-testdata dir into N DISJOINT WORLDS, so each heavy family's
  * expected work — and its telemetry counts — at factor N is a CLOSED
  * FORM of the sf0.1 capture (N× pairs, N× peel edges), which makes the
  * scaled run self-verifying without an oracle at that size:
  *
  *  - every id column is offset by `k * stride` per copy k (stride =
  *    max(id)+1 of the source) — joins/groups never cross copies;
  *  - `documents.text`: every whitespace token is suffixed `_k<k>` — the
  *    shingle/df structure WITHIN a copy is identical to the source while
  *    the shingle spaces across copies are disjoint, so dd25's candidate
  *    pairs and dd11's duplicate flags at factor N are exactly N× the
  *    source's (token-suffixing, not doc duplication: naive replication
  *    would make every doc a 10-way exact dup and square the pair work);
  *  - `embeddings.embedding`: a per-copy deterministic SIGN FLIP (the
  *    hash of (dim, copy) picks ±1). Sign patterns are orthogonal
  *    transforms, so within-copy dot products — hence cc15's kNN graph
  *    per copy — are EXACTLY preserved, while cross-copy cosines shrink
  *    ~1/√D toward 0 (a random-sign inner product), keeping the copies'
  *    neighborhoods apart;
  *  - `customer.c_name`: prefixed with a doubled copy letter ("aa", "bb",
  *    …) — edit distance ≥ 2 across copies, 0 within, so tx27's
  *    distance-≤1 pair set is exactly N× the source's;
  *  - `lineitem` keys offset → N disjoint co-purchase graphs for cc20,
  *    identical truss peels per copy.
  *
  * Usage: GenScale <srcSfDir> <dstDir> [factor=10]. No randomness, no
  * clock — byte-identical output across runs.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def strideOf(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).head().getLong(0) + 1L

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[genscale] wrote $name × $factor")
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dStride = strideOf(docs, "doc_id")
    write((0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k * dStride)).as("doc_id"),
        concat_ws(" ",
          expr(s"transform(split(text, ' '), x -> concat(x, '_k$k'))"))
          .as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _), "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vStride = strideOf(emb, "vec_id")
    write((0 until factor).map { k =>
      emb.select(
        (col("vec_id") + lit(k * vStride)).as("vec_id"),
        expr(s"""transform(embedding, (x, i) ->
                |  CASE WHEN pmod(xxhash64(i + ${k * 4096}), 2) = 0
                |       THEN x ELSE -x END)""".stripMargin).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _), "embeddings")

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val cStride = strideOf(cust, "c_custkey")
    write((0 until factor).map { k =>
      val prefix = ('a' + k).toChar.toString * 2
      cust.select(
        (col("c_custkey") + lit(k * cStride)).as("c_custkey"),
        concat(lit(prefix), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }.reduce(_ unionByName _), "customer")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val oStride = strideOf(li, "l_orderkey")
    val pStride = strideOf(li, "l_partkey")
    val sStride = strideOf(li, "l_suppkey")
    write((0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * oStride))
        .withColumn("l_partkey", col("l_partkey") + lit(k * pStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * sStride))
    }.reduce(_ unionByName _), "lineitem")

    spark.stop()
  }
}
