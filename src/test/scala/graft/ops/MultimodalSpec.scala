package graft.ops

import graft.SparkSpec

/** Multimodal plumbing contracts: the decode/resize/frame-sample stages
  * are STUB transforms (no codecs in the sandbox) behind REAL Spark
  * seams — schema, narrow batch shape, per-row determinism, and the
  * arithmetic the mm_decode DuckDB oracle checks.
  */
class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three"),
      (2L, "x" * 400)
    ).toDF("doc_id", "text")
  }

  test("decodeFeatures: deterministic dims, Long arithmetic matches oracle formula") {
    import spark.implicits._
    val got = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .select("doc_id", "n_bytes", "width", "height", "n_frames")
      .as[(Long, Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    got.foreach { case (_, (_, n, w, h, f)) =>
      assert(w == 64 + (n % 577))
      assert(h == 64 + ((n * 31L) % 433))
      assert(f == 1 + (n % 7))
    }
    // media type cycles by doc_id % 3
    val types = Multimodal.withPayload(docs).select("doc_id", "media_type")
      .as[(Long, String)].collect().toMap
    assert(types(0L) == "image" && types(1L) == "audio" && types(2L) == "video")
  }

  test("resize: payload shrinks proportionally to target area, dims set") {
    import spark.implicits._
    val resized = Multimodal.resize(Multimodal.withPayload(docs), 8, 8)
      .as[(Long, String, Int, Int, Array[Byte])].collect()
    assert(resized.forall(r => r._3 == 8 && r._4 == 8))
    val orig = Multimodal.withPayload(docs)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    resized.foreach { case (id, _, _, _, bytes) =>
      assert(bytes.nonEmpty && bytes.length <= orig(id).length)
      // deterministic: same input → same sample
      assert(bytes.forall(orig(id).contains))
    }
  }

  test("ImageIoCodec: REAL decode/resize of JDK-encodable images; failure rows kept") {
    import spark.implicits._
    // real image payloads, generated in-test with the same JDK encoders
    // the codec reads with — no external fixtures
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 37 + y * 101) & 0xffffff)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }
    // magic bytes of a real PNG followed by garbage: a reader IS
    // selected, then throws mid-decode — must degrade to the failure
    // row, never fail the task (the codec catches NonFatal, not just
    // IOException, because imageio throws RuntimeExceptions on corrupt
    // recognized-format payloads)
    val corrupt = png(20, 12).take(40) ++ Array.fill[Byte](64)(0x5a)
    val payloads = Seq(
      (0L, png(20, 12), "image"),
      (1L, bmp(8, 5), "image"),
      (2L, "not an image at all".getBytes("UTF-8"), "audio"),
      (3L, corrupt, "image"))
      .toDF("doc_id", "payload", "media_type")
    val got = Multimodal.decodeFeatures(payloads, Multimodal.ImageIoCodec)
      .select("doc_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 20, 12, 1)))
    assert(got(1L) == ((1L, 8, 5, 1)))
    assert(got(2L) == ((2L, -1, -1, -1))) // undecodable: kept, flagged
    assert(got.contains(3L)) // corrupt-after-header: kept, no crash
    // features: luminance histogram sums to 1 for real images, zeros else
    val feats = Multimodal.decodeFeatures(payloads, Multimodal.ImageIoCodec)
      .select("doc_id", "feat").as[(Long, Array[Float])].collect().toMap
    assert(math.abs(feats(0L).sum - 1.0f) < 1e-3)
    assert(feats(2L).forall(_ == 0f))
    assert(feats(3L).forall(_ == 0f)) // pixel decode fails → zero vector
    // real resize: re-encoded PNG round-trips with the target dimensions
    val resized = Multimodal.resize(payloads, 10, 6, Multimodal.ImageIoCodec)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    assert(!resized.contains(2L)) // undecodable rows dropped from resize
    assert(!resized.contains(3L))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0L)))
    assert(back.getWidth == 10 && back.getHeight == 6)
    // determinism: same payload → identical re-encoded bytes
    val resized2 = Multimodal.resize(payloads, 10, 6, Multimodal.ImageIoCodec)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    assert(resized(0L).toSeq == resized2(0L).toSeq)
  }

  test("WavCodec: REAL decode/features/resample of in-test-generated PCM WAV") {
    import spark.implicits._
    // 0.1 s of 440 Hz sine at 8 kHz stereo (right channel half volume)
    val rate = 8000; val frames = 800
    val pcm = new Array[Byte](frames * 2 * 2)
    (0 until frames).foreach { i =>
      val v = math.sin(2 * math.Pi * 440 * i / rate)
      Seq((v, 0), (v / 2, 1)).foreach { case (s, c) =>
        val x = math.round(s * 32767).toInt
        val o = (i * 2 + c) * 2
        pcm(o) = (x & 0xff).toByte; pcm(o + 1) = ((x >> 8) & 0xff).toByte
      }
    }
    val wav = Multimodal.WavCodec.header(rate, 2, pcm.length) ++ pcm
    // decode: true rate / channels / frame count
    assert(Multimodal.WavCodec.decodeOpt(wav).contains((rate, 2, frames)))
    // features: a sine's RMS is ~A/sqrt(2); mono mixdown of (v, v/2) has
    // amplitude 0.75 → RMS ≈ 0.53 per segment; ZCR ≈ 2×440/8000 = 0.11
    val f = Multimodal.WavCodec.features(wav)
    (0 until 4).foreach(i => assert(math.abs(f(i) - 0.53) < 0.02, s"rms seg $i = ${f(i)}"))
    (4 until 8).foreach(i => assert(math.abs(f(i) - 0.11) < 0.02, s"zcr seg $i = ${f(i)}"))
    // resample to 4 kHz mono: output re-parses with halved frames and the
    // zero-crossing RATE is preserved (same tone, half the samples/sec)
    val down = Multimodal.WavCodec.resizeBytes(wav, 4000, 1).get
    assert(Multimodal.WavCodec.decodeOpt(down).contains((4000, 1, frames / 2)))
    val f2 = Multimodal.WavCodec.features(down)
    (4 until 8).foreach(i => assert(math.abs(f2(i) - 0.22) < 0.03, s"zcr seg $i = ${f2(i)}"))
    // non-WAV payloads degrade to None/zeros, and the pipeline keeps the
    // failure rows with (-1, -1, -1)
    assert(Multimodal.WavCodec.decodeOpt("not a wav".getBytes).isEmpty)
    // corrupt chunk size near 2^31 must yield None, not wrap the offset
    // negative and throw (the seam contract)
    val evil = Multimodal.WavCodec.header(8000, 1, 4).clone()
    evil(16) = 0xf0.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte // fmt chunk size = 0x7ffffff0
    assert(Multimodal.WavCodec.decodeOpt(evil).isEmpty)
    assert(Multimodal.WavCodec.features(evil).forall(_ == 0f))
    val mixed = Seq((1L, "audio", wav), (2L, "audio", "junk junk junk".getBytes))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodeFeatures(mixed, codec = Multimodal.WavCodec)
      .select("doc_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((rate, 2, frames)))
    assert(out(2L) == ((-1, -1, -1)))
  }

  test("sampleFrames: one row per sampled frame, strides respected, bytes partition") {
    import spark.implicits._
    val all = Multimodal.sampleFrames(Multimodal.withPayload(docs), stride = 1)
      .as[(Long, String, Int, Array[Byte])].collect()
    val decoded = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
      .select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    decoded.foreach { case (id, nf) =>
      val frames = all.filter(_._1 == id)
      assert(frames.length == nf)
      assert(frames.map(_._3).sorted.toSeq == (0 until nf))
      // stride=1 frame bytes concatenate back to the full payload
      val orig = Multimodal.withPayload(docs).filter($"doc_id" === id)
        .select("payload").as[Array[Byte]].head()
      val concat = frames.sortBy(_._3).flatMap(_._4)
      assert(concat.toSeq == orig.toSeq)
    }
    val strided = Multimodal.sampleFrames(Multimodal.withPayload(docs), stride = 2)
      .as[(Long, String, Int, Array[Byte])].collect()
    assert(strided.forall(_._3 % 2 == 0))
  }
}
