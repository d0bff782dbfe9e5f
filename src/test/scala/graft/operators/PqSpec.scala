package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss09/ss10 product quantization on a planted two-cluster corpus: the
  * subspace codebooks must preserve the cluster structure (every member of
  * a cluster gets the same 4 codes as its seed), and the ADC top-k must
  * return same-cluster candidates — the property that makes PQ an ANN
  * index rather than a hash. Vectors get a small per-id jitter so raw
  * values differ within a cluster while codes agree.
  *
  * Seeds are vec_id % 250 == 0, so ids run 0..250 to plant exactly two:
  * id 0 in cluster A (+1-ish), id 250 in cluster B (-1-ish); queries are
  * vec_id % 100 == 0 → 0, 100 (both A) and 200 (B).
  */
class PqSpec extends SparkSpec {

  test("ss09/ss10: codes follow clusters; ADC top-k stays in-cluster") {
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
      // every member shares all 4 codes with its cluster's seed
      val inA = (id: Long) => id < 126
      (0 to 250).foreach { id =>
        val seed = if (inA(id)) 0L else 250L
        (0 until 4).foreach { m =>
          assert(codes((id.toLong, m)) == codes((seed, m)),
            s"vec $id subspace $m code ${codes((id.toLong, m))} != seed's ${codes((seed, m))}")
        }
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
