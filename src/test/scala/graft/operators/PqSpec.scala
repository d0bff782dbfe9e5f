package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss09/ss10 product quantization on a planted two-cluster corpus: the
  * subspace codebooks must preserve the cluster structure (a member's
  * codes always trace back to seeds of its OWN cluster — codebook entries
  * inherit their seed's vec_id, and Lloyd can't migrate a centroid across
  * two far-apart clusters), and the ADC top-k must return same-cluster
  * candidates — the property that makes PQ an ANN index rather than a
  * hash. Vectors get a small per-id jitter so raw values differ within a
  * cluster.
  *
  * Ids run 0..250: cluster A (+1-ish) is id < 126, B (-1-ish) the rest;
  * PQ seeds are every 25th id (both clusters get several), queries are
  * vec_id % 100 == 0 → 0, 100 (both A) and 200 (B).
  */
class PqSpec extends SparkSpec {

  test("ss09/ss10: codes stay within clusters; ADC top-k stays in-cluster") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("pq-emb").toFile
    try {
      def vec(sign: Float, id: Int): Array[Float] =
        Array.tabulate(64)(d => sign * (1.0f + ((id + d) % 7) * 0.001f))
      val rows = (0 to 250).map { id =>
        val sign = if (id < 126) 1.0f else -1.0f
        (id.toLong, vec(sign, id), if (sign > 0) "a" else "b")
      }
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

      val codes = Similarity.ss09PqEncode(spark, tmp.getPath)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      // exactly 4 codes per vector
      assert(codes.size == 251 * 4, s"${codes.size} code cells")
      // a member's code must be a centroid descended from its own
      // cluster's seeds (cent_id inherits the seed vec_id): A-members
      // (+1-ish) code to seeds < 126, B-members to seeds >= 126
      val inA = (id: Long) => id < 126
      codes.foreach { case ((id, m), code) =>
        assert(inA(id) == inA(code),
          s"vec $id subspace $m coded to the other cluster's centroid $code")
      }
      val top = Similarity.ss10PqAdc(spark, tmp.getPath)
        .select(col("q_id"), col("c_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(top.nonEmpty)
      top.foreach { case (q, c) =>
        assert(inA(q) == inA(c), s"ADC top-k crossed clusters: q=$q c=$c")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }
}
