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
