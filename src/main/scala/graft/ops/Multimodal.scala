package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque BINARY columns with typed metadata, and decode/feature-extract
  * runs as a batched `mapPartitions` stage (the Scala equivalent of a
  * pandas-UDF batch loop: per-partition init of the (stub) codec, batch
  * iteration, columnar output).
  *
  * The container has no image/audio codecs, so [[StubCodec.decode]] is a
  * clearly-marked deterministic fake — the Spark-side contract (schema,
  * partitioning, batch shape, null behavior) is real and tested, and a
  * real codec drops into the same seam.
  */
object Multimodal {

  /** Deterministic stand-in for a media codec. */
  object StubCodec {
    /** STUB: a real implementation would decode image bytes; this derives
      * deterministic pseudo-metadata from the payload so the pipeline is
      * testable end-to-end (and DuckDB-oracle-able). Arithmetic is done in
      * Long to match the oracle's BIGINT semantics on payloads past 2^31/31
      * bytes; the oracle derives sizes from length(text) (characters),
      * equal to the UTF-8 byte count only on ASCII corpora — the testdata
      * generator guarantees that (charset asserted).
      */
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length.toLong
      val w = (64 + (n % 577)).toInt
      val h = (64 + ((n * 31L) % 433)).toInt
      val frames = (1 + (n % 7)).toInt
      (w, h, frames)
    }

    /** STUB feature vector: 8 deterministic moments of the byte stream
      * (a real extractor would emit an embedding).
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](8)
      var i = 0
      while (i < bytes.length) {
        acc(i % 8) += (bytes(i) & 0xff)
        i += 1
      }
      acc.map(v => (v % 997).toFloat / 997f)
    }
  }

  /** Attach a synthetic binary payload column (UTF-8 of the text — in a
    * real deployment this is the stored media blob) plus media-type
    * metadata.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  /** Batched decode/feature-extract over the binary column. Output
    * schema: (doc_id, media_type, n_bytes, width, height, n_frames,
    * feat ARRAY<FLOAT>). Narrow stage; batch shape = partition iterator.
    */
  def decodeFeatures(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would happen here (expensive handle)
        it.map { case (id, mt, bytes) =>
          val (w, h, f) = StubCodec.decode(bytes)
          (id, mt, bytes.length.toLong, w, h, f, StubCodec.features(bytes))
        }
      }
      .toDF("doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "feat")
  }

  /** Batched resize stage. STUB transform: a real codec would decode,
    * rescale and re-encode; the stub emits a deterministic byte
    * subsample proportional to the target area so downstream size
    * accounting is testable. The Spark contract — narrow mapPartitions
    * batch, per-partition codec init seam, (id, type, dims, payload)
    * schema — is the real one a codec drops into.
    */
  def resize(withBytes: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val (w, h, _) = StubCodec.decode(bytes)
          // keep ceil(n * targetArea / srcArea) bytes, evenly strided
          val srcArea = math.max(1L, w.toLong * h)
          val keep = math.max(1L,
            (bytes.length.toLong * targetW * targetH + srcArea - 1) / srcArea)
          val n = math.min(bytes.length.toLong, keep).toInt
          val out = new Array[Byte](n)
          var i = 0
          while (i < n) {
            out(i) = bytes(((i.toLong * bytes.length) / n).toInt)
            i += 1
          }
          (id, mt, targetW, targetH, out)
        }
      }
      .toDF("doc_id", "media_type", "width", "height", "payload")
  }

  /** Frame sampling for video payloads: the decode's n_frames partitions
    * the payload into equal frame slices; every `stride`-th frame is
    * emitted as its own row — the explode-shaped op a training pipeline
    * feeds to per-frame feature extraction. STUB slicing (a real codec
    * seeks keyframes); the one-row-per-frame contract is real.
    */
  def sampleFrames(withBytes: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1)
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, mt, bytes) =>
        val (_, _, nFrames) = StubCodec.decode(bytes)
        val frameLen = math.max(1, bytes.length / math.max(1, nFrames))
        (0 until nFrames by stride).iterator.map { f =>
          val from = math.min(bytes.length, f * frameLen)
          val until = if (f == nFrames - 1) bytes.length
            else math.min(bytes.length, from + frameLen)
          (id, mt, f, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
      .toDF("doc_id", "media_type", "frame_idx", "frame_bytes")
  }
}
