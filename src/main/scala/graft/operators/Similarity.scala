package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * Array[Float], label) — the ANN surface of a training-data pipeline.
  *
  * Two tiers, both oracle-checkable:
  *  - ss01: brute-force cosine top-k — the exact baseline. The query set is
  *    broadcast, the dot products are computed map-side with zip_with /
  *    aggregate (no shuffle until the final per-query top-k), so cost is
  *    n_queries × corpus but never corpus².
  *  - ss02: random-hyperplane LSH ANN — the 100 TB path. Each vector gets an
  *    8-bit signature (sign of the dot product with 8 deterministic ±1
  *    hyperplanes); candidates are an equi-join on the bucket key, rerank is
  *    exact cosine within buckets only. Recall < 1 by construction; the
  *    oracle runs the same algorithm so results still hash-match.
  *
  * Number conventions shared with [[Dedup]]: vectors are quantized to
  * integers (floor(x·1000)) so dot products and norms are exact in both
  * engines; cosine = dot / sqrt(n1·n2) computed from those exact integers is
  * bit-identical IEEE math in Spark and DuckDB.
  */
object Similarity {
  import Relational.Q

  private val K = 10
  private val numPlanes = 8

  // (vec_id, v: Array[Long], nrm: Long) — quantized ints, shared with Dedup.
  private def qvec(s: SparkSession, dir: String): DataFrame =
    Dedup.quantized(Tables(s, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm"))

  private val qvecSql: String =
    """q AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      | FROM embeddings),
      |qn AS (SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nrm FROM q)""".stripMargin

  // Exact integer dot product of two quantized vectors (columns v1, v2) —
  // graft.functions.DotProductLong, codegen'd (registered by Dedup.quantized
  // via qvec).
  private val dotExpr = "dot_l(v1, v2)"

  // ---------------------------------------------------------------------
  // ss01: brute-force cosine top-k. Query set = every 100th vector. The
  // query side is broadcast; the per-query top-k is one window over
  // n_queries × corpus scored rows.
  // ---------------------------------------------------------------------
  def ss01BruteTopk(s: SparkSession, dir: String): DataFrame = {
    val base = qvec(s, dir)
    val qs = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("v1"), col("nrm").as("n1"))
    val cand = base
      .select(col("vec_id").as("c_id"), col("v").as("v2"), col("nrm").as("n2"))
    val scored = cand.join(broadcast(qs), col("q_id") =!= col("c_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos",
        col("dot") / sqrt(col("n1").cast("double") * col("n2").cast("double")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
      .select(col("q_id"), col("c_id"), col("rnk"), col("dot"), col("cos"))
  }

  val ss01Oracle: String =
    s"""WITH $qvecSql,
       |scored AS (
       | SELECT a.vec_id AS q_id, b.vec_id AS c_id,
       |  CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
       |  a.nrm AS n1, b.nrm AS n2
       | FROM qn a JOIN qn b ON a.vec_id % 100 = 0 AND a.vec_id != b.vec_id)
       |SELECT q_id, c_id, rnk, dot, cos FROM (
       | SELECT q_id, c_id, dot,
       |  dot / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) DESC, c_id ASC) AS rnk
       | FROM scored) t WHERE rnk <= $K""".stripMargin

  // ---------------------------------------------------------------------
  // ss02: LSH-bucketed ANN. Deterministic ±1 hyperplanes (parity of the
  // first hex digit of md5("p:d")), precomputed DRIVER-SIDE and embedded as
  // literals — the naive version evaluated 8×64 md5 calls per row inside an
  // interpreted lambda. Signature bit p = sign of Σ_d v[d]·w(p,d); bucket =
  // the 8-bit signature. Join on bucket, exact-cosine rerank inside buckets.
  // At scale: the bucket join shuffles each side once on a 1-byte key and
  // every bucket holds ~corpus/256 — no all-pairs anywhere.
  // ---------------------------------------------------------------------
  private val dims = 64

  /** w(p)(d) ∈ {-1, +1} from md5 parity — same arithmetic both engines see. */
  private[operators] def planesFor(n: Int): Seq[Seq[Int]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { p =>
      (1 to dims).map { d =>
        val hex = mdig.digest(s"$p:$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (("0123456789abcdef".indexOf(hex(0)) % 2) * 2) - 1
      }
    }
  }
  private[operators] val planes: Seq[Seq[Int]] = planesFor(numPlanes)

  // Native codegen'd signature (graft.functions.LshBucket) — the same
  // hyperplane-parity math as `planes` above, one primitive loop per row.
  // The interpreted nested-aggregate HOF form this replaced made ss02 the
  // slowest bench query (7.8 s at sf0.1).
  private[operators] val bucketExpr = s"lsh_bucket(v, $numPlanes)"

  /** DuckDB SQL for the n-plane signature of column `v` — the same plane
    * matrix [[LshBucketImpl]] caches, embedded as literals. */
  private[operators] def bucketSqlFor(n: Int): String = {
    val lit = planesFor(n).map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""list_sum(list_transform(range(0, $n), p ->
       |  CASE WHEN list_sum(list_transform(range(1, len(v) + 1), d ->
       |         v[d] * ($lit)[p + 1][d]))
       |       > 0 THEN (2 ** p) ELSE 0 END))""".stripMargin
  }

  private[operators] val bucketSql: String = bucketSqlFor(numPlanes)

  def ss02AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val bucketed = qvec(s, dir).withColumn("bucket", expr(bucketExpr))
    val qs = bucketed.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("v1"), col("nrm").as("n1"),
        col("bucket"))
    val cand = bucketed
      .select(col("vec_id").as("c_id"), col("v").as("v2"), col("nrm").as("n2"),
        col("bucket"))
    val scored = cand.join(broadcast(qs), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos",
        col("dot") / sqrt(col("n1").cast("double") * col("n2").cast("double")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
      .select(col("q_id"), col("c_id"), col("bucket").cast("long").as("bucket"),
        col("rnk"), col("cos"))
  }

  val ss02Oracle: String =
    s"""WITH $qvecSql,
       |bucketed AS (
       | SELECT vec_id, v, nrm, CAST($bucketSql AS BIGINT) AS bucket FROM qn),
       |scored AS (
       | SELECT a.vec_id AS q_id, b.vec_id AS c_id, a.bucket AS bucket,
       |  CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
       |  a.nrm AS n1, b.nrm AS n2
       | FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket
       |  AND a.vec_id % 100 = 0 AND a.vec_id != b.vec_id)
       |SELECT q_id, c_id, bucket, rnk, cos FROM (
       | SELECT q_id, c_id, bucket,
       |  dot / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) DESC, c_id ASC) AS rnk
       | FROM scored) t WHERE rnk <= $K""".stripMargin

  // ---------------------------------------------------------------------
  // ss03: IVF-style ANN. "Centroids" are a deterministic sample (every
  // 250th vector — a k-means step would slot in here without changing the
  // dataflow); every vector is assigned to its nearest centroid (argmax
  // cosine, broadcast centroid set, map-side); queries probe the 2 nearest
  // centroid lists and rerank exactly within them. At scale the probe join
  // shuffles on the centroid id — each list is ~corpus/k — and the
  // assignment pass is shuffle-free.
  // ---------------------------------------------------------------------
  private val nprobe = 2

  def ss03AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val base = qvec(s, dir)
    val cents = base.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("v2"), col("nrm").as("n2"))
    def centScored(src: DataFrame, idCol: String): DataFrame =
      src.select(col("vec_id").as(idCol), col("v").as("v1"), col("nrm").as("n1"))
        .join(broadcast(cents), lit(true))
        .withColumn("ccos",
          expr(dotExpr) / sqrt(col("n1").cast("double") * col("n2").cast("double")))
    // Assignment (k=1) is an argmax, NOT a top-k: max_by gets a map-side
    // partial aggregate, where a window would sort-shuffle the full
    // corpus×centroid product just to take row 1. Tiebreak matches the
    // oracle's ORDER BY ccos DESC, cent_id ASC via the (ccos, -cent_id)
    // struct ordering.
    val assigned = centScored(base, "a_id")
      .groupBy(col("a_id"))
      .agg(max_by(col("cent_id"),
        struct(col("ccos"), (-col("cent_id")).as("neg"))).as("cent_id"))
    // Probes need the 2 nearest lists, and only for the query subset (1% of
    // the corpus) — a window over that small set is fine.
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    val probes = centScored(base.filter(col("vec_id") % 100 === 0), "q_id")
      .withColumn("crn", row_number().over(wProbe)).filter(col("crn") <= nprobe)
      .select(col("q_id"), col("cent_id"))
    val qs = base.select(col("vec_id").as("q_id"), col("v").as("v1"), col("nrm").as("n1"))
    val cs = base.select(col("vec_id").as("c_id"), col("v").as("v2"), col("nrm").as("n2"))
    val scored = probes.join(assigned, Seq("cent_id"))
      .filter(col("q_id") =!= col("a_id"))
      .select(col("q_id"), col("a_id").as("c_id")).distinct()
      .join(broadcast(qs), Seq("q_id"))
      .join(cs, Seq("c_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos",
        col("dot") / sqrt(col("n1").cast("double") * col("n2").cast("double")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
      .select(col("q_id"), col("c_id"), col("rnk"), col("cos"))
  }

  val ss03Oracle: String =
    s"""WITH $qvecSql,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM qn WHERE vec_id % 250 = 0),
       |cscored AS (
       | SELECT qn.vec_id, cents.cent_id,
       |  CAST(list_sum(list_transform(range(1, len(qn.v) + 1), i -> qn.v[i] * cents.cv[i])) AS BIGINT)
       |    / sqrt(CAST(qn.nrm AS DOUBLE) * CAST(cents.cn AS DOUBLE)) AS ccos
       | FROM qn CROSS JOIN cents),
       |ranked AS (
       | SELECT vec_id, cent_id,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crn
       | FROM cscored),
       |assigned AS (SELECT vec_id AS a_id, cent_id FROM ranked WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, cent_id FROM ranked WHERE crn <= $nprobe AND vec_id % 100 = 0),
       |pairs AS (
       | SELECT DISTINCT p.q_id, a.a_id AS c_id
       | FROM probes p JOIN assigned a ON p.cent_id = a.cent_id AND p.q_id != a.a_id),
       |scored AS (
       | SELECT pairs.q_id, pairs.c_id,
       |  CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT)
       |    / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS cos
       | FROM pairs JOIN qn a ON pairs.q_id = a.vec_id JOIN qn b ON pairs.c_id = b.vec_id)
       |SELECT q_id, c_id, rnk, cos FROM (
       | SELECT q_id, c_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rnk
       | FROM scored) t WHERE rnk <= $K""".stripMargin

  // ---------------------------------------------------------------------
  // ss04: k-means (Lloyd's) — the clustering step the IVF comment above
  // points at, distributed and integer-exact so the oracle hash-matches:
  // assignment is argmin of the EXACT squared distance ‖v‖²+‖c‖²-2·v·c
  // over broadcast centroids (map-side, no shuffle of the corpus);
  // the centroid update is posexplode → per-(cluster, dim) sum →
  // truncate(sum/n) rebuilt into an integer vector. One full Lloyd
  // round (assign → update → reassign), reporting per-cluster size and
  // inertia. At scale each round is one narrow pass plus one
  // (cluster, dim)-keyed aggregate — centroids stay broadcast-size.
  // ---------------------------------------------------------------------
  private def kmAssign(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.join(broadcast(cents), lit(true))
      .withColumn("d2",
        col("nrm") + col("cnrm") - expr("2 * dot_l(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("m.cent_id").as("cluster"), col("m.d2").as("d2"))

  def ss04Kmeans(s: SparkSession, dir: String): DataFrame = {
    val pts = qvec(s, dir)
    val c0 = pts.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val a1 = kmAssign(pts, c0)
    // Per-dimension truncated mean: double division of exact integers is
    // identical IEEE math in both engines, and BOTH truncate toward zero
    // (Spark double→long cast; DuckDB trunc()) — integer `div` would
    // diverge on negative sums (Spark truncates, DuckDB floors).
    val c1 = a1.join(pts, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("mx", (col("sx").cast("double") / col("n")).cast("long"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(d, mx))), s -> s.mx)").as("cv"))
      .select(col("cluster").as("cent_id"), col("cv"),
        expr("dot_l(cv, cv)").as("cnrm"))
    kmAssign(pts, c1)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"))
  }

  val ss04Oracle: String =
    s"""WITH $qvecSql,
       |c0 AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM qn WHERE vec_id % 250 = 0),
       |s1 AS (
       | SELECT qn.vec_id, c0.cent_id,
       |  qn.nrm + c0.cnrm - 2 * CAST(list_sum(list_transform(range(1, len(qn.v) + 1), i -> qn.v[i] * c0.cv[i])) AS BIGINT) AS d2
       | FROM qn CROSS JOIN c0),
       |r1 AS (SELECT vec_id, cent_id, d2,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn FROM s1),
       |a1 AS (SELECT vec_id, cent_id AS cluster, d2 FROM r1 WHERE rn = 1),
       |dims AS (
       | SELECT a1.cluster, generate_subscripts(qn.v, 1) AS d, unnest(qn.v) AS x
       | FROM a1 JOIN qn ON a1.vec_id = qn.vec_id),
       |means AS (
       | SELECT cluster, d, CAST(trunc(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mx
       | FROM dims GROUP BY cluster, d),
       |c1 AS (
       | SELECT cluster AS cent_id, list(mx ORDER BY d) AS cv FROM means GROUP BY cluster),
       |c1n AS (SELECT cent_id, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cnrm FROM c1),
       |s2 AS (
       | SELECT qn.vec_id, c1n.cent_id,
       |  qn.nrm + c1n.cnrm - 2 * CAST(list_sum(list_transform(range(1, len(qn.v) + 1), i -> qn.v[i] * c1n.cv[i])) AS BIGINT) AS d2
       | FROM qn CROSS JOIN c1n),
       |r2 AS (SELECT vec_id, cent_id, d2,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn FROM s2),
       |a2 AS (SELECT vec_id, cent_id AS cluster, d2 FROM r2 WHERE rn = 1)
       |SELECT cluster, COUNT(*) AS n_members, CAST(SUM(d2) AS BIGINT) AS inertia
       |FROM a2 GROUP BY cluster""".stripMargin

  val queries: Map[String, Q] = Map(
    "ss01_brute_topk" -> (ss01BruteTopk _),
    "ss02_ann_lsh" -> (ss02AnnLsh _),
    "ss03_ann_ivf" -> (ss03AnnIvf _),
    "ss04_kmeans" -> (ss04Kmeans _))

  val oracles: Map[String, String] = Map(
    "ss01_brute_topk" -> ss01Oracle,
    "ss02_ann_lsh" -> ss02Oracle,
    "ss03_ann_ivf" -> ss03Oracle,
    "ss04_kmeans" -> ss04Oracle)
}
