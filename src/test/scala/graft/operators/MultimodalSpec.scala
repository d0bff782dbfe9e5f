package graft.operators

import java.awt.image.BufferedImage

import graft.SparkSpec

/** Drives the multimodal plumbing end-to-end on the sf0.001 testdata.
  * The image path is REAL (PNG encode via ImageIO, decode via ImageIO):
  * golden-checked against hand-derived pixel values and against an
  * independent pure-Scala recomputation of the whole
  * pixels→luma→block-mean pipeline (PNG is lossless, so the two must be
  * bit-identical floats).
  */
class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata; image rows are real PNGs") {
    val m = Multimodal.mediaFromDocuments(spark, dir).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.bytes.nonEmpty && r.width >= 16 && r.height >= 16))
    assert(m.map(_.kind).toSet == Set("image", "audio", "video"))
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(m.filter(_.kind == "image")
      .forall(_.bytes.take(4).sameElements(pngMagic)), "image payloads must be PNG")
    assert(m.filter(_.kind == "video")
      .forall(r => new String(r.bytes.take(4), "US-ASCII") == "GRVF"),
      "video payloads must be GRVF containers")
  }

  test("GRVF encode -> decode round-trips exact frames; malformed payloads fail loudly") {
    val frames = Multimodal.syntheticFrames(42L, 6, 4, 3)
    val bytes = Multimodal.encodeRawVideo(6, 4, frames)
    val (w, h, back) = Multimodal.decodeVideo(bytes)
    assert(w == 6 && h == 4 && back.length == 3)
    for (f <- 0 until 3) assert(back(f).sameElements(frames(f)))
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo(bytes.dropRight(1)) // truncated
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo("not a video".getBytes("UTF-8")) // bad magic
    }
  }

  test("golden: hand-built 2-frame video decodes to exact frame features") {
    import spark.implicits._
    // frame 0 all-zero -> features 0; frame 1 all-0xFF -> 255·8/64 = 31.875
    val frames = Array(new Array[Byte](64), Array.fill(64)(0xff.toByte))
    val media = Seq(Multimodal.MediaRow(9L, "video",
      Multimodal.encodeRawVideo(8, 8, frames), 8, 8, 3)).toDS()
    val out = Multimodal.sampleFrames(media, stride = 1, maxFrames = 8, dim = 8)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 2)
    assert(out(0).features.toSeq == Seq.fill(8)(0f), out(0).features.toSeq)
    assert(out(1).features.toSeq == Seq.fill(8)(31.875f), out(1).features.toSeq)
  }

  test("sceneCuts: planted cut found, sub-threshold drift ignored") {
    import spark.implicits._
    // 4 frames of 4×2: f0=0s, f1=0s (no diff), f2=100s (Σ|Δ|=800 ≥
    // 24·8=192 → cut), f3=101s (Σ|Δ|=8 < 192 → same scene).
    val mk = (v: Int) => Array.fill(8)(v.toByte)
    val frames = Array(mk(0), mk(0), mk(100), mk(101))
    val media = Seq(Multimodal.MediaRow(3L, "video",
      Multimodal.encodeRawVideo(4, 2, frames), 4, 2, 4)).toDS()
    val got = Multimodal.sceneCuts(media).collect().sortBy(_.scene_idx)
    assert(got.toSeq == Seq(
      Multimodal.Scene(3L, 0, 0, 2, 0L),
      Multimodal.Scene(3L, 1, 2, 2, 800L)), got.toSeq.toString)
  }

  test("sceneCuts: single-frame and static videos yield one scene") {
    import spark.implicits._
    val one = Array(Array.fill(8)(7.toByte))
    val static = Array.fill(3)(Array.fill(8)(9.toByte))
    val media = Seq(
      Multimodal.MediaRow(1L, "video", Multimodal.encodeRawVideo(4, 2, one), 4, 2, 1),
      Multimodal.MediaRow(2L, "video", Multimodal.encodeRawVideo(4, 2, static), 4, 2, 3)
    ).toDS()
    val got = Multimodal.sceneCuts(media).collect()
      .map(s => (s.media_id, s.scene_idx, s.start_frame, s.n_frames)).toSet
    assert(got == Set((1L, 0, 0, 1), (2L, 0, 0, 3)), got.toString)
  }

  test("sampled frame features match an independent recomputation from the generator") {
    val out = Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(out.nonEmpty)
    for (ff <- out.take(20)) {
      val id = ff.media_id
      val w = (id % 64 + 16).toInt
      val h = (id % 48 + 16).toInt
      val frame = Multimodal.syntheticFrames(id, w, h, (id % 12 + 4).toInt)(ff.frame_idx)
      val ref = new Array[Float](8)
      for (i <- frame.indices)
        ref(i % 8) += (frame(i) & 0xff).toFloat / frame.length
      assert(ff.features.toSeq == ref.toSeq,
        s"media $id frame ${ff.frame_idx}: container decode diverged")
    }
  }

  test("golden: hand-built 2x2 PNG decodes to exact luma features") {
    import spark.implicits._
    // grays 10/20/30/40 -> luma == gray value; dim=4 -> one pixel per block
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    def gray(v: Int) = (v << 16) | (v << 8) | v
    img.setRGB(0, 0, gray(10)); img.setRGB(1, 0, gray(20))
    img.setRGB(0, 1, gray(30)); img.setRGB(1, 1, gray(40))
    val media = Seq(Multimodal.MediaRow(7L, "image",
      Multimodal.encodePng(img), 2, 2, 3)).toDS()
    val feats = Multimodal.extractFeatures(media, dim = 4).collect().head
    assert(feats.features.toSeq == Seq(10f, 20f, 30f, 40f), feats.features.toSeq)
  }

  test("golden: PNG encode->ImageIO decode features match an independent recomputation") {
    // Pure-Scala reference: same pixel function, same luma, same block
    // means — but WITHOUT going through PNG bytes or the Spark pipeline.
    def reference(id: Long, w: Int, h: Int, dim: Int): Seq[Float] = {
      val plane = new Array[Byte](w * h)
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = id * 1315423911L + x * 2654435761L + y * 97531L
          val rgb = ((v >>> 16) & 0xffffffL).toInt
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          plane(i) = luma.toByte; i += 1; x += 1
        }
        y += 1
      }
      val feats = new Array[Float](dim)
      val block = math.max(plane.length / dim, 1)
      var b = 0
      while (b < dim) {
        var s = 0L; var n = 0; var j = b * block
        while (j < math.min((b + 1) * block, plane.length)) {
          s += plane(j) & 0xff; n += 1; j += 1
        }
        feats(b) = if (n == 0) 0f else s.toFloat / n
        b += 1
      }
      feats.toSeq
    }
    val out = Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(spark, dir).filter(_.kind == "image"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { f =>
      val w = (f.media_id % 64 + 16).toInt
      val h = (f.media_id % 48 + 16).toInt
      assert(f.features.toSeq == reference(f.media_id, w, h, 16),
        s"media ${f.media_id}: decoded features diverge from reference")
    }
  }

  test("feature extraction is deterministic and fixed-width") {
    val f1 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(f1.forall(_.features.length == 16))
    val m1 = f1.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 == m2)
  }

  test("resize re-encodes REAL payloads for every kind (still decodable)") {
    val r = Multimodal.resize(
      Multimodal.mediaFromDocuments(spark, dir).limit(6), 32, 32).collect()
    assert(r.forall(m => m.width == 32 && m.height == 32))
    r.foreach { m =>
      m.kind match {
        case "image" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.bytes))
          assert(img.getWidth == 32 && img.getHeight == 32)
        case "audio" =>
          assert(Multimodal.decodeAudio(m.bytes).length == 32 * 32,
            "audio resize must resample to w*h samples in a decodable WAV")
        case _ =>
          val (w, h, frames) = Multimodal.decodeVideo(m.bytes)
          assert(w == 32 && h == 32 && frames.nonEmpty,
            "video resize must rescale every frame in a decodable GRVF")
      }
    }
  }

  test("mm03: identical pixels share a perceptual hash; planted dup is flagged") {
    import spark.implicits._
    // two byte-for-byte re-encodes of the SAME pixels (PNG is lossless, so
    // the decoded planes — and hence the aHash — must collide), plus one
    // genuinely different image
    val imgA = Multimodal.syntheticImage(5L, 24, 20)
    val dupRows = Seq(
      Multimodal.MediaRow(100L, "image", Multimodal.encodePng(imgA), 24, 20, 3),
      Multimodal.MediaRow(200L, "image", Multimodal.encodePng(imgA), 24, 20, 3),
      Multimodal.MediaRow(300L, "image",
        Multimodal.encodePng(Multimodal.syntheticImage(99L, 24, 20)), 24, 20, 3))
      .toDS()
    val hashed = Multimodal.withPerceptualHash(
        Multimodal.extractFeatures(dupRows))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(100L) == hashed(200L), "identical pixels must collide")
    assert(hashed(100L) != hashed(300L), "different image must not collide")
    // and the full query flags the planted dup on real testdata shapes
    val out = Multimodal.mm03ImageNeardup(spark, dir)
    assert(out.count() > 0)
    assert(out.filter("is_dup AND media_id = keep_id").count() == 0,
      "keeper is never its own dup")
  }

  test("frame sampling fans out only video rows") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.values.exists(_.length > 1)) // real fan-out happened
  }

  test("WAV encode -> AudioSystem decode round-trips the exact samples") {
    val samples = Multimodal.syntheticSamples(11L, 3000)
    val back = Multimodal.decodeAudio(Multimodal.encodeWav(samples))
    assert(back.length == samples.length)
    assert(back.sameElements(samples), "PCM-in-RIFF must be lossless")
    // and the payload really is a RIFF/WAVE container
    val wav = Multimodal.encodeWav(samples)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("golden: audio frame features match hand-derived values") {
    import spark.implicits._
    // frame 0: constant +1000 -> rms 1000, no crossings;
    // frame 1: alternating ±2000 -> rms 2000, a crossing at every step
    val samples = (Array.fill(256)(1000.toShort) ++
      Array.tabulate(256)(i => if (i % 2 == 0) 2000.toShort else -2000.toShort))
    val media = Seq(Multimodal.MediaRow(5L, "audio",
      Multimodal.encodeWav(samples), 0, 0, 1)).toDS()
    val frames = Multimodal.audioFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.toSeq == Seq(
      Multimodal.AudioFrame(5L, 0, 1000L, 0),
      Multimodal.AudioFrame(5L, 1, 2000L, 255)), frames.toSeq)
  }

  test("mm04 features match an independent recomputation of the full pipeline") {
    val out = Multimodal.mm04AudioFrames(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getInt(3))).toMap
    assert(out.nonEmpty)
    // independent reference straight from the sample generator (the WAV
    // container must not change anything)
    val audioIds = out.keySet.map(_._1)
    for (id <- audioIds.take(5)) {
      val s = Multimodal.syntheticSamples(id, (2048 + id % 1024).toInt)
      val n = math.min(s.length / 256, 8)
      for (f <- 0 until n) {
        var sumSq = 0L; var zc = 0
        for (i <- f * 256 until (f + 1) * 256) {
          sumSq += s(i).toLong * s(i)
          if (i > f * 256 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
        }
        val expected = (math.sqrt(sumSq.toDouble / 256).toLong, zc)
        assert(out((id, f)) == expected, s"media $id frame $f")
      }
    }
  }

  test("vadSegments: planted silence/burst pattern yields exact segments") {
    import spark.implicits._
    // 8 frames of 256 samples: silence, burst, burst, silence, silence,
    // burst, silence, burst -> segments [1,2], [5,5], [7,7]
    val active = Set(1, 2, 5, 7)
    val samples = Array.tabulate(8 * 256) { i =>
      if (active(i / 256)) 20000.toShort else 0.toShort
    }
    val row = Multimodal.MediaRow(7L, "audio",
      Multimodal.encodeWav(samples), 0, 0, 1)
    val segs = Multimodal.vadSegments(Seq(row).toDS()).collect()
      .map(s => (s.seg_idx, s.start_frame, s.n_frames)).sorted.toSeq
    assert(segs == Seq((0, 1, 2), (1, 5, 1), (2, 7, 1)), segs.toString)
    // constant-amplitude burst: peak energy is exactly 256 * 20000^2
    val peak = Multimodal.vadSegments(Seq(row).toDS()).collect().head.peak_energy
    assert(peak == 256L * 20000L * 20000L)
  }

  test("vadSegments: all-silence audio yields no segments; all-voice yields one") {
    import spark.implicits._
    val silent = Multimodal.MediaRow(1L, "audio",
      Multimodal.encodeWav(new Array[Short](1024)), 0, 0, 1)
    val voiced = Multimodal.MediaRow(2L, "audio",
      Multimodal.encodeWav(Array.fill[Short](1024)(15000)), 0, 0, 1)
    val segs = Multimodal.vadSegments(Seq(silent, voiced).toDS()).collect()
    assert(segs.forall(_.media_id == 2L))
    assert(segs.map(s => (s.start_frame, s.n_frames)).toSeq == Seq((0, 4)))
  }

  test("corruptionAudit: planted bad payloads are counted, never job-killing") {
    import spark.implicits._
    val good = Seq(
      Multimodal.MediaRow(1L, "image",
        Multimodal.encodePng(Multimodal.syntheticImage(1L, 8, 8)), 8, 8, 3),
      Multimodal.MediaRow(2L, "audio",
        Multimodal.encodeWav(Multimodal.syntheticSamples(2L, 512)), 0, 0, 1),
      Multimodal.MediaRow(3L, "video",
        Multimodal.encodeRawVideo(4, 4, Multimodal.syntheticFrames(3L, 4, 4, 2)), 4, 4, 1))
    val bad = Seq(
      Multimodal.MediaRow(4L, "image", Array[Byte](1, 2, 3), 0, 0, 3),
      Multimodal.MediaRow(5L, "video", good(2).bytes.dropRight(3), 4, 4, 1))
    val audit = Multimodal.corruptionAudit((good ++ bad).toDS())
      .collect().map(a => a.kind -> (a.n_total, a.n_ok, a.n_corrupt)).toMap
    assert(audit == Map(
      "image" -> ((2L, 1L, 1L)),
      "audio" -> ((1L, 1L, 0L)),
      "video" -> ((2L, 1L, 1L))), audit.toString)
  }

  test("mm07: truncated payloads are exactly the id % 13 == 0 rows") {
    val media = Multimodal.mediaFromDocuments(spark, dir).collect()
    val expected = media.groupBy(_.kind).map { case (k, rows) =>
      k -> rows.count(_.media_id % 13 == 0).toLong }
    val audit = Multimodal.mm07CorruptionAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    for ((k, nBad) <- expected) {
      assert(audit(k)._2 == nBad, s"$k: ${audit(k)} expected $nBad corrupt")
      assert(audit(k)._1 == media.count(_.kind == k).toLong)
    }
  }

  test("mm06: every doc id yields voiced segments under the speech fixture") {
    val out = Multimodal.mm06AudioVad(spark, dir).collect()
    assert(out.nonEmpty)
    val byId = out.groupBy(_.getLong(0))
    // 12 frames in 2-voiced/2-silent phase: always >= 2 segments per id
    assert(byId.values.forall(_.length >= 2), byId.view.mapValues(_.length).toMap.toString)
    // segments never overlap and stay inside the 12-frame payload
    for ((_, segs) <- byId) {
      val sorted = segs.sortBy(_.getInt(2)).toSeq
      assert(sorted.forall(r => r.getInt(3) >= 1 && r.getInt(2) + r.getInt(3) <= 12))
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(a.getInt(2) + a.getInt(3) < b.getInt(2), "segments must be separated")
    }
  }
}
