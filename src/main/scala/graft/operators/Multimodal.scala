package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in partition-sized batches.
  *
  * The Spark-side shape is the real deliverable — schema (binary payload +
  * metadata struct), partitioning (decode is a narrow mapPartitions, no
  * shuffle; feature vectors are fixed-width arrays ready for
  * [[Similarity]]-style ANN), and batch amortization (any native codec would
  * be initialized once per partition, not per row).
  *
  * ==STUB== The byte→pixel/sample decode itself is a DETERMINISTIC FAKE
  * (`decodeStub`): real image/audio codecs are not available in this
  * container. Swap `decodeStub` for a real codec call (e.g. javax.imageio /
  * ffmpeg bindings) without touching any of the Spark plumbing around it.
  */
object Multimodal {
  import Relational.Q

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, channels: Int)
  final case class MediaFeatures(media_id: Long, kind: String, dim: Int,
      features: Array[Float])
  final case class FrameFeatures(media_id: Long, frame_idx: Int,
      features: Array[Float])

  /** Synthetic media table over `documents`: deterministic binary payloads
    * (the UTF-8 bytes) tagged with a kind and fake dimensions. Stands in for
    * `spark.read.format("binaryFile")` over a media landing dir. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("doc_id") % 64 + 16).cast("int").as("width"),
        (col("doc_id") % 48 + 16).cast("int").as("height"),
        lit(3).cast("int").as("channels"))
      .as[MediaRow]
  }

  /** ==STUB== stand-in for a real codec: deterministically expands `bytes`
    * to a w×h "pixel" plane. Replace with a real decode; the signature (one
    * media payload → fixed-shape plane) is what the pipeline relies on. */
  def decodeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h, 1))
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) {
        // deterministic pseudo-decode: stride through the payload
        out(i) = (bytes(((i.toLong * 2654435761L) % bytes.length).toInt)
          ^ (i & 0x7f)).toByte
        i += 1
      }
    }
    out
  }

  /** Fixed-width block-mean features over the decoded plane. Narrow
    * per-partition pass: decoder state would be reused across the batch. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // (a real codec would be constructed HERE, once per partition)
      rows.map { m =>
        val plane = decodeStub(m.bytes, m.width, m.height)
        val feats = new Array[Float](dim)
        val block = math.max(plane.length / dim, 1)
        var b = 0
        while (b < dim) {
          var s = 0L; var n = 0; var i = b * block
          while (i < math.min((b + 1) * block, plane.length)) {
            s += plane(i) & 0xff; n += 1; i += 1
          }
          feats(b) = if (n == 0) 0f else s.toFloat / n
          b += 1
        }
        MediaFeatures(m.media_id, m.kind, dim, feats)
      }
    }
  }

  /** "Resize": re-decode at a new target shape — shows that shape params
    * flow through the plumbing (the stub just re-strides). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(bytes = decodeStub(m.bytes, w, h),
      width = w, height = h))
  }

  /** Frame sampling for `video` rows: every `stride`-th frame gets its own
    * feature vector — one input row fans out to n_frames rows (flatMap, still
    * narrow / shuffle-free). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4,
      maxFrames: Int = 8, dim: Int = 8): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter((m: MediaRow) => m.kind == "video").flatMap { m =>
      val nFrames = math.min(math.max(m.bytes.length / 64, 1), maxFrames * stride)
      (0 until nFrames by stride).map { f =>
        val frame = decodeStub(m.bytes.drop(f * 7), 8, 8)
        val feats = new Array[Float](dim)
        var i = 0
        while (i < frame.length) {
          feats(i % dim) += (frame(i) & 0xff).toFloat / frame.length
          i += 1
        }
        FrameFeatures(m.media_id, f, feats)
      }
    }
  }

  // Driver-checkable queries (no SQL oracle — binary/codec ops are not
  // SQL-expressible; the driver records a rows-only check).
  def mm01Features(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir))
      .toDF().select(col("media_id"), col("kind"), col("dim"),
        round(expr("aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"), 3)
          .as("feature_sum"))

  def mm02FrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir))
      .toDF().select(col("media_id"), col("frame_idx"))

  val queries: Map[String, Q] = Map(
    "mm01_media_features" -> (mm01Features _),
    "mm02_frame_sample" -> (mm02FrameSample _))

  val oracles: Map[String, String] = Map.empty
}
