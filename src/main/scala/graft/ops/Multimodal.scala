package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque BINARY columns with typed metadata, and decode/feature-extract
  * runs as a batched `mapPartitions` stage (the Scala equivalent of a
  * pandas-UDF batch loop: per-partition init of the codec, batch
  * iteration, columnar output).
  *
  * The codec is a SEAM ([[MediaCodec]]) with three implementations:
  *  - [[ImageIoCodec]] — a REAL image codec over the JDK's built-in
  *    `javax.imageio` readers (PNG/JPEG/BMP/GIF ship with the JVM — no
  *    external dependency): true dimensions + frame counts, luminance
  *    histogram features, real rescale-and-reencode resize.
  *  - [[WavCodec]] — a REAL audio codec for RIFF/WAVE PCM (pure-JDK
  *    header + sample parser): true sample rate / channels / frame
  *    counts, per-segment RMS + zero-crossing features, real
  *    resample-and-reencode "resize".
  *  - [[StubCodec]] — a clearly-marked deterministic fake for the one
  *    modality the JDK has no codec for (video) and for the
  *    DuckDB-oracle-able driver query, whose payloads are synthetic
  *    UTF-8 bytes, not real media.
  */
object Multimodal {

  /** The codec seam: decode returns None for undecodable payloads. */
  trait MediaCodec extends Serializable {
    /** (width, height, n_frames), or None if the payload can't be decoded. */
    def decodeOpt(bytes: Array[Byte]): Option[(Int, Int, Int)]
    /** Fixed-width feature vector (zeros when undecodable). */
    def features(bytes: Array[Byte]): Array[Float]
    /** Re-encoded payload at (w, h), or None if undecodable. */
    def resizeBytes(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]]
  }

  /** Deterministic stand-in for a media codec. */
  object StubCodec extends MediaCodec {
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

    override def decodeOpt(bytes: Array[Byte]): Option[(Int, Int, Int)] =
      Some(decode(bytes))

    /** STUB feature vector: 8 deterministic moments of the byte stream
      * (a real extractor would emit an embedding).
      */
    override def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](8)
      var i = 0
      while (i < bytes.length) {
        acc(i % 8) += (bytes(i) & 0xff)
        i += 1
      }
      acc.map(v => (v % 997).toFloat / 997f)
    }

    /** STUB resize: deterministic strided byte subsample proportional to
      * the target area (see [[Multimodal.resize]]).
      */
    override def resizeBytes(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
      val (w, h, _) = decode(bytes)
      val srcArea = math.max(1L, w.toLong * h)
      val keep = math.max(1L,
        (bytes.length.toLong * tw * th + srcArea - 1) / srcArea)
      val n = math.min(bytes.length.toLong, keep).toInt
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = bytes(((i.toLong * bytes.length) / n).toInt)
        i += 1
      }
      Some(out)
    }
  }

  /** REAL image codec over the JDK's bundled `javax.imageio` readers —
    * no external libraries. Decodes true dimensions and frame counts
    * (animated GIFs report their frame count), extracts an 8-bin
    * luminance histogram as the feature vector (pixel-sampled so cost is
    * bounded per image), and resizes by bilinear redraw + deterministic
    * PNG re-encode. Undecodable payloads (audio, video, corrupt bytes)
    * yield None/zeros — side-output accounting is the caller's choice.
    */
  object ImageIoCodec extends MediaCodec {
    // executors may run headless; AWT raster ops don't need a display
    private def ensureHeadless(): Unit =
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")

    override def decodeOpt(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      ensureHeadless()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          // NonFatal, not just IOException: imageio readers throw
          // RuntimeExceptions on corrupt payloads whose magic bytes ARE
          // recognized (IllegalArgument/IndexOutOfBounds/CMMException/
          // NegativeArraySize...) — a single bad image must degrade to
          // None, never fail the task on every retry
          try Some((r.getWidth(0), r.getHeight(0),
            math.max(1, r.getNumImages(true))))
          catch { case scala.util.control.NonFatal(_) => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      ensureHeadless()
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

    override def features(bytes: Array[Byte]): Array[Float] =
      readImage(bytes) match {
        case None => new Array[Float](8)
        case Some(img) =>
          val hist = new Array[Long](8)
          val w = img.getWidth; val h = img.getHeight
          // sample at most ~4096 pixels so feature cost is O(1) per image
          val step = math.max(1, (w.toLong * h / 4096L).toInt)
          var idx = 0; var n = 0L
          val total = w.toLong * h
          while (idx < total) {
            val x = (idx % w).toInt; val y = (idx / w).toInt
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1
            n += 1
            idx += step
          }
          hist.map(v => if (n == 0) 0f else v.toFloat / n)
      }

    override def resizeBytes(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] =
      readImage(bytes).map { img =>
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
  }

  /** REAL audio codec for RIFF/WAVE PCM payloads — a pure-JDK header +
    * sample parser (no javax.sound dependency, so it works on any
    * executor). The image-shaped [[MediaCodec]] contract maps naturally:
    * decode = (sample_rate, channels, n_frames = sample frames);
    * features = 4 per-segment RMS energies + 4 per-segment zero-crossing
    * rates over the mono mixdown (the classic cheap audio-quality
    * signals); resize(targetRate, targetChannels) = nearest-neighbor
    * resample + channel mixdown/spread, re-encoded as 16-bit PCM WAV.
    * Non-WAV / non-PCM / corrupt payloads yield None/zeros like the
    * image codec. Video remains the one stubbed modality (no codec in
    * the JDK).
    */
  object WavCodec extends MediaCodec {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private final case class Wav(channels: Int, sampleRate: Int,
                                 bits: Int, dataOff: Int, dataLen: Int) {
      def bytesPerFrame: Int = channels * (bits / 8)
      def frames: Int = dataLen / bytesPerFrame
      /** Sample of frame i, channel c, as a double in [-1, 1). */
      def sample(b: Array[Byte], i: Int, c: Int): Double = {
        val o = dataOff + i * bytesPerFrame + c * (bits / 8)
        if (bits == 16) (le16(b, o).toShort).toDouble / 32768.0
        else ((b(o) & 0xff) - 128).toDouble / 128.0
      }
      /** Mono mixdown of frame i. */
      def mono(b: Array[Byte], i: Int): Double = {
        var s = 0.0; var c = 0
        while (c < channels) { s += sample(b, i, c); c += 1 }
        s / channels
      }
    }

    private def parse(b: Array[Byte]): Option[Wav] = {
      if (b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      // offsets tracked in Long: a corrupt chunk size near 2^31 must
      // degrade to None (the seam contract), never wrap negative and
      // throw out of the String constructor
      var off = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val o = off.toInt
        val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = le32(b, o + 4).toLong & 0xffffffffL // chunk size is u32
        val avail = math.min(sz, (b.length - off - 8)).toInt
        id match {
          case "fmt " if avail >= 16 =>
            fmt = Some((le16(b, o + 8), le16(b, o + 10),
              le32(b, o + 12), le16(b, o + 22)))
          case "data" => data = Some((o + 8, avail))
          case _ =>
        }
        off += 8L + sz + (sz & 1L) // chunks are word-aligned
      }
      for {
        (f, ch, sr, bits) <- fmt
        (doff, dlen) <- data
        if f == 1 && ch > 0 && ch <= 64 && sr > 0 && (bits == 8 || bits == 16)
      } yield Wav(ch, sr, bits, doff, dlen)
    }

    override def decodeOpt(bytes: Array[Byte]): Option[(Int, Int, Int)] =
      parse(bytes).map(w => (w.sampleRate, w.channels, w.frames))

    override def features(bytes: Array[Byte]): Array[Float] =
      parse(bytes) match {
        case None => new Array[Float](8)
        case Some(w) if w.frames == 0 => new Array[Float](8)
        case Some(w) =>
          val out = new Array[Float](8)
          val segLen = math.max(1, w.frames / 4)
          var seg = 0
          while (seg < 4) {
            val from = seg * segLen
            val until = if (seg == 3) w.frames else math.min(w.frames, from + segLen)
            var sumSq = 0.0; var zc = 0; var prev = 0.0; var n = 0
            var i = from
            while (i < until) {
              val s = w.mono(bytes, i)
              sumSq += s * s
              if (n > 0 && ((s >= 0) != (prev >= 0))) zc += 1
              prev = s; n += 1; i += 1
            }
            if (n > 0) {
              out(seg) = math.sqrt(sumSq / n).toFloat
              out(4 + seg) = zc.toFloat / n
            }
            seg += 1
          }
          out
      }

    /** "Resize" = resample to `targetRate` Hz and `targetChannels`
      * channels (mixdown to mono when 1, channel-mapped otherwise),
      * nearest-neighbor in time, 16-bit PCM output.
      */
    override def resizeBytes(bytes: Array[Byte], targetRate: Int,
                             targetChannels: Int): Option[Array[Byte]] =
      parse(bytes).flatMap { w =>
        val outFramesL = math.max(1L, w.frames.toLong * targetRate / w.sampleRate)
        val outBytesL = outFramesL * targetChannels * 2L
        // refuse (None) rather than Int-truncate a huge upsample into a
        // silently tiny or negative-sized output
        // targetChannels caps at 64 (the parse-side bound): beyond that the
        // 16-bit channels header field would overflow long before the byte
        // budget does, producing a header that disagrees with the data
        if (targetRate <= 0 || targetChannels <= 0 || targetChannels > 64 ||
          w.frames == 0 || outBytesL > Int.MaxValue - 64) None
        else {
          val outFrames = outFramesL.toInt
          val data = new Array[Byte](outBytesL.toInt)
          var i = 0
          while (i < outFrames) {
            val src = math.min(w.frames - 1,
              (i.toLong * w.sampleRate / targetRate).toInt)
            var c = 0
            while (c < targetChannels) {
              val v =
                if (targetChannels == 1) w.mono(bytes, src)
                else w.sample(bytes, src, c % w.channels)
              val s = math.max(-32768, math.min(32767, math.round(v * 32768.0))).toInt
              val o = (i * targetChannels + c) * 2
              data(o) = (s & 0xff).toByte
              data(o + 1) = ((s >> 8) & 0xff).toByte
              c += 1
            }
            i += 1
          }
          Some(header(targetRate, targetChannels, data.length) ++ data)
        }
      }

    /** Canonical 44-byte PCM WAV header. */
    private[graft] def header(rate: Int, channels: Int, dataLen: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      bb.array()
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
    * feat ARRAY<FLOAT>). Narrow stage; batch shape = partition iterator;
    * undecodable payloads keep their row with (-1, -1, -1) dimensions
    * (queryable, never silently dropped) and a zero feature vector.
    */
  def decodeFeatures(withBytes: DataFrame,
                     codec: MediaCodec = StubCodec): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would happen here (expensive handle)
        it.map { case (id, mt, bytes) =>
          val (w, h, f) = codec.decodeOpt(bytes).getOrElse((-1, -1, -1))
          (id, mt, bytes.length.toLong, w, h, f, codec.features(bytes))
        }
      }
      .toDF("doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "feat")
  }

  /** Batched resize stage: decode → rescale → re-encode through the
    * codec seam ([[ImageIoCodec]] does a real bilinear redraw + PNG
    * re-encode; [[StubCodec]] emits a deterministic byte subsample
    * proportional to the target area so size accounting stays testable
    * for media the sandbox can't decode). Undecodable payloads are
    * DROPPED from the resized output — at scale, pair with
    * [[decodeFeatures]]' (-1, -1, -1) rows for failure accounting.
    */
  def resize(withBytes: DataFrame, targetW: Int, targetH: Int,
             codec: MediaCodec = StubCodec): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, mt, bytes) =>
          codec.resizeBytes(bytes, targetW, targetH)
            .map(out => (id, mt, targetW, targetH, out))
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
  def sampleFrames(withBytes: DataFrame, stride: Int,
                   codec: MediaCodec = StubCodec): DataFrame = {
    require(stride >= 1)
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, mt, bytes) =>
        val (_, _, nFrames) = codec.decodeOpt(bytes).getOrElse((0, 0, 0))
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
