package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Media payload: opaque bytes + typed metadata. The schema a 100 TB
  * multimodal lake uses: content as `binary` (parquet BYTE_ARRAY,
  * never parsed by the engine), metadata as flat typed columns so
  * predicate pushdown/pruning work (filter by media_type or dims
  * without touching bytes). */
final case class MediaRecord(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    width: Int,
    height: Int,
    n_frames: Int)

/** Per-record features extracted by the (stubbed) decoder. */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    checksum: String,
    mean_byte: Double,
    n_sampled_frames: Int)

/** Multimodal column pipeline: decode / feature-extract / resize /
  * frame-sample over opaque binary columns.
  *
  * The real decode (JPEG/PCM/H.264) would sit in `decodeStub` — media
  * codecs are NOT in this container, so the byte→pixels step is a
  * clearly-marked deterministic fake. Everything around it is the real
  * Spark plumbing and is what matters at scale:
  *
  *  - typed `Dataset[MediaRecord]` with a `binary` content column;
  *  - `mapPartitions` batch shape (the Scala analogue of arrow-batched
  *    pandas UDFs): one iterator per partition so a real decoder would
  *    amortize codec init per-partition, not per-row;
  *  - metadata stays in flat typed columns → scans prune/push down
  *    without reading bytes.
  */
object Multimodal {

  /** STUB — deterministic fake decode. A real implementation would
    * decode `content` with an image/audio codec; this container has
    * none, so features are pure byte arithmetic (deterministic and
    * cross-engine checkable). */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.content.length) { sum += (r.content(i) & 0xff); i += 1 }
    val mean = if (r.content.length == 0) 0.0 else sum.toDouble / r.content.length
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      n_bytes = r.content.length.toLong,
      checksum = java.security.MessageDigest.getInstance("MD5")
        .digest(r.content).map("%02x".format(_)).mkString,
      mean_byte = math.rint(mean * 1e6) / 1e6,
      // frame-sample stub: every 10th frame, at least 1
      n_sampled_frames = math.max(1, r.n_frames / 10))
  }

  /** Batch feature extraction — partition-at-a-time, codec init once
    * per partition (the `mapInPandas` batch shape, Scala-typed). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real code: val codec = Codec.open() — once per partition
      it.map(decodeStub)
    }
  }

  /** Build a deterministic media table from the documents corpus (text
    * bytes standing in for encoded media). Used by tests/queries since
    * the testdata has no true binary table. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col(idCol).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")).as("media_type"),
        col(textCol).cast("binary").as("content"),
        (col(idCol) % 64 + 16).cast("int").as("width"),
        (col(idCol) % 48 + 16).cast("int").as("height"),
        (col(idCol) % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  // ---- real encode/decode path (uncompressed containers) -------------

  /** Image geometry for [[encodedMedia]]: fixed 16-px-wide frames,
    * capped payloads (oracle-computable sizes; see q55). */
  val BmpWidth = 16
  val BmpMaxBytes = 240
  val WavMaxSamples = 400
  val WavRate = 8000

  /** Deterministic ENCODED media table: text bytes become real
    * containers by id — doc_id%3 = 0 → 24-bit BMP (grayscale pixels =
    * text bytes, zero-padded to full rows), 1 → 16-bit PCM WAV
    * (samples = centered text bytes), 2 → raw passthrough (modeling a
    * format whose codec is absent). Unlike [[syntheticMedia]]'s opaque
    * bytes, these blobs are genuine containers that
    * [[decodeMedia]] re-parses byte-for-byte. */
  def encodedMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[(Long, Array[Byte])] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, text) =>
        val bytes = (id % 3) match {
          case 0 =>
            val len = math.min(text.length, BmpMaxBytes)
            val h = math.max(1, (len + BmpWidth - 1) / BmpWidth)
            val gray = java.util.Arrays.copyOf(text, BmpWidth * h)
            MediaCodec.encodeBmp(BmpWidth, h, gray)
          case 1 =>
            val n = math.min(text.length, WavMaxSamples)
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              samples(i) = (((text(i) & 0xff) - 128) * 256).toShort; i += 1
            }
            MediaCodec.encodeWavPcm16(WavRate, samples)
          case _ => text
        }
        (id, bytes)
      }
  }

  /** Features from a REAL decode ([[MediaCodec]]), dispatched on the
    * container magic; unknown formats pass through as "raw". */
  final case class DecodedMedia(
      media_id: Long, fmt: String, n_bytes: Long,
      w: Long, h: Long, n_samples: Long, mean_signal: Double)

  /** Genuine bytes→pixels/samples decode, partition-at-a-time (same
    * batch shape as [[extractFeatures]]). `mean_signal` is the mean
    * gray level (BMP) / RMS amplitude (WAV) — decode fidelity is
    * asserted against independently computed values in DecodeSpec.
    *
    * Magic bytes only ROUTE; the decoder VALIDATES. A payload that
    * merely starts with 'BM'/'RIFF' (e.g. raw text beginning "BM25…")
    * fails the decoder's header checks and falls back to "raw" instead
    * of crashing the job — on arbitrary corpora the dispatch byte is
    * data, not a type tag. */
  def decodeMedia(media: Dataset[(Long, Array[Byte])]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    def raw(id: Long, bytes: Array[Byte]) =
      DecodedMedia(id, "raw", bytes.length.toLong, 0L, 0L, 0L, 0d)
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
          try {
            val (w, h, gray) = MediaCodec.decodeBmp(bytes)
            var sum = 0L
            gray.foreach(g => sum += (g & 0xff))
            val mean = if (gray.isEmpty) 0d else sum.toDouble / gray.length
            DecodedMedia(id, "bmp", bytes.length.toLong, w.toLong, h.toLong, 0L,
              math.rint(mean * 1e6) / 1e6)
          } catch { case scala.util.control.NonFatal(_) => raw(id, bytes) }
        } else if (bytes.length >= 4 &&
            new String(bytes, 0, 4, "US-ASCII") == "RIFF") {
          try {
            val (_, samples) = MediaCodec.decodeWavPcm16(bytes)
            var sq = 0d
            samples.foreach(s => sq += s.toDouble * s)
            val rms = if (samples.isEmpty) 0d else math.sqrt(sq / samples.length)
            DecodedMedia(id, "wav", bytes.length.toLong, 0L, 0L, samples.length.toLong,
              math.rint(rms * 1e6) / 1e6)
          } catch { case scala.util.control.NonFatal(_) => raw(id, bytes) }
        } else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
            (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) {
          try {
            val (w, h, gray) = MediaCodec.decodeJpegGray(bytes)
            var sum = 0L
            gray.foreach(g => sum += (g & 0xff))
            val mean = if (gray.isEmpty) 0d else sum.toDouble / gray.length
            DecodedMedia(id, "jpeg", bytes.length.toLong, w.toLong, h.toLong, 0L,
              math.rint(mean * 1e6) / 1e6)
          } catch { case scala.util.control.NonFatal(_) => raw(id, bytes) }
        } else raw(id, bytes)
      }
    }
  }

  // ---- PNG path (compressed container, still dependency-free) --------

  /** Image geometry for [[encodedPng]]: fixed 16-px-wide frames,
    * capped payloads (oracle-computable geometry, as q55's BMP). */
  val PngWidth = 16
  val PngMaxBytes = 240

  /** Deterministic PNG media table: text bytes become real
    * DEFLATE-compressed PNGs ([[MediaCodec.encodePng]]) — RGB for even
    * ids, RGBA for odd, so both supported color types flow through the
    * gate. Pixels = text bytes (capped, zero-padded to full frames),
    * laid into channels sequentially. */
  def encodedPng(docs: DataFrame, idCol: String, textCol: String): Dataset[(Long, Array[Byte])] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, text) =>
        val ch = 3 + (id % 2).toInt
        val rowB = PngWidth * ch
        val len = math.min(text.length, PngMaxBytes)
        val h = math.max(1, (len + rowB - 1) / rowB)
        // truncate at the cap THEN zero-pad to full frames (copyOf of
        // the raw text would smuggle real bytes past the cap when the
        // frame is larger than it)
        val px = new Array[Byte](PngWidth * h * ch)
        System.arraycopy(text, 0, px, 0, len)
        (id, MediaCodec.encodePng(PngWidth, h, ch, px))
      }
  }

  /** Features from a real PNG decode: geometry from the parsed IHDR,
    * `pix_sum` the unsigned sum of every decoded pixel byte — a
    * CONTENT check (a decoder that mis-unfiltered or mis-inflated any
    * byte fails it), not just header math. */
  final case class DecodedPng(
      media_id: Long, w: Long, h: Long, channels: Long,
      pix_bytes: Long, pix_sum: Long)

  def decodePngFeatures(media: Dataset[(Long, Array[Byte])]): Dataset[DecodedPng] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, ch, px) = MediaCodec.decodePng(bytes)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
        DecodedPng(id, w.toLong, h.toLong, ch.toLong, px.length.toLong, sum)
      }
    }
  }

  // ---- JPEG path (lossy compressed container, JDK imageio) ----------

  /** Image geometry for [[jpegRoundTrip]] — same frame layout as the
    * PNG path (16-px rows, capped payloads) so geometry stays
    * oracle-computable from byte lengths alone. */
  val JpegWidth = 16
  val JpegMaxBytes = 240
  val JpegQuality = 0.95f

  /** Accuracy bound for the q72 gate: the decoded image's mean gray
    * must sit within this many gray levels of the source mean. JPEG is
    * LOSSY — per-pixel values are quantizer properties, not
    * recomputable facts — but the block DC terms survive quantization
    * at quality 0.95, so the image MEAN is stable well under 1 level
    * even on high-frequency text-byte noise (JpegSpec measures it);
    * 2.0 is ≥4× the observed worst case. */
  val JpegMeanTol = 2.0

  /** One row per document: exact source geometry/sum plus the
    * `mean_ok` within-bound claim from a REAL lossy round trip
    * (encode at [[JpegQuality]] → ImageIO decode → mean compare). */
  final case class JpegRoundTrip(
      media_id: Long, w: Long, h: Long, src_sum: Long, mean_ok: Boolean)

  /** Text bytes → real baseline JPEG → real decode → geometry + mean
    * bound. Geometry and `src_sum` are exact and oracle-recomputable;
    * the codec's lossy content rides the gate as the within-bound
    * boolean (the q22/q48 pattern for non-recomputable values). */
  def jpegRoundTrip(docs: DataFrame, idCol: String, textCol: String): Dataset[JpegRoundTrip] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val len = math.min(text.length, JpegMaxBytes)
          val h = math.max(1, (len + JpegWidth - 1) / JpegWidth)
          // truncate at the cap THEN zero-pad (see encodedPng)
          val px = new Array[Byte](JpegWidth * h)
          System.arraycopy(text, 0, px, 0, len)
          var srcSum = 0L
          px.foreach(b => srcSum += (b & 0xff))
          val jpeg = MediaCodec.encodeJpegGray(JpegWidth, h, px, JpegQuality)
          val (dw, dh, dec) = MediaCodec.decodeJpegGray(jpeg)
          var decSum = 0L
          dec.foreach(b => decSum += (b & 0xff))
          val ok = dw == JpegWidth && dh == h &&
            math.abs(decSum.toDouble / (dw.toLong * dh) -
              srcSum.toDouble / (JpegWidth.toLong * h)) <= JpegMeanTol
          JpegRoundTrip(id, dw.toLong, dh.toLong, srcSum, ok)
        }
      }
  }

  // ---- multi-frame GIF: real frame extraction + sampling -------------

  val GifFrameW = 16
  val GifFrameH = 8
  val GifFrameBytes: Int = GifFrameW * GifFrameH // 128
  val GifMaxFrames = 4

  /** One row per document: the REAL multi-frame pipeline — frame
    * count, every-2nd-frame sample sums, and the lossless round-trip
    * verdict. */
  final case class GifFrames(
      media_id: Long, w: Long, h: Long, n_frames: Long, n_sampled: Long,
      sampled_sum: Long, all_sum: Long, lossless: Boolean)

  /** Text bytes → up to [[GifMaxFrames]] 16×8 grayscale frames → a
    * real multi-frame GIF ([[MediaCodec.encodeGifGray]]) → full decode
    * ([[MediaCodec.decodeGifFrames]]) → every-2nd-frame sampling. GIF's
    * gray palette makes the round trip LOSSLESS, so the sampled and
    * total pixel sums are exact facts the oracle recomputes from the
    * source bytes (zero-padding contributes zero); `lossless` pins
    * frame-exact equality of the decode. This is the frame-extraction/
    * frame-sampling stage of a video pipeline run against the JVM's
    * one genuine multi-frame container. */
  def gifFrameSample(docs: DataFrame, idCol: String, textCol: String): Dataset[GifFrames] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val len = math.min(text.length, GifFrameBytes * GifMaxFrames)
          val nF = math.max(1, (len + GifFrameBytes - 1) / GifFrameBytes)
          val frames = (0 until nF).map { f =>
            val px = new Array[Byte](GifFrameBytes)
            val off = f * GifFrameBytes
            val n = math.max(0, math.min(GifFrameBytes, len - off))
            if (n > 0) System.arraycopy(text, off, px, 0, n)
            px
          }
          val gif = MediaCodec.encodeGifGray(GifFrameW, GifFrameH, frames)
          val (dw, dh, dec) = MediaCodec.decodeGifFrames(gif)
          val lossless = dw == GifFrameW && dh == GifFrameH &&
            dec.length == nF &&
            frames.zip(dec).forall { case (a, b) => java.util.Arrays.equals(a, b) }
          var all = 0L
          var sampled = 0L
          dec.zipWithIndex.foreach { case (f, i) =>
            var s = 0L
            f.foreach(b => s += (b & 0xff))
            all += s
            if (i % 2 == 0) sampled += s
          }
          GifFrames(id, dw.toLong, dh.toLong, dec.length.toLong,
            (dec.length + 1L) / 2L, sampled, all, lossless)
        }
      }
  }

  // ---- MJPEG-in-AVI: real VIDEO container frame sampling --------------

  val AviFrameW = 16
  val AviFrameH = 8
  val AviFrameBytes: Int = AviFrameW * AviFrameH // 128
  val AviMaxFrames = 4
  val AviFps = 10

  /** Per-frame mean-gray tolerance for the q186 gate — the q72 JPEG
    * contract applied frame-wise: per-pixel MJPEG output is a
    * quantizer property, but each frame's MEAN survives quality-0.95
    * quantization well under 1 gray level (AviSpec measures it);
    * 2.0 carries the same ≥4× margin as [[JpegMeanTol]]. */
  val AviMeanTol = 2.0

  /** One row per document: the REAL video-container pipeline — AVI
    * geometry, frame count, every-2nd-frame SOURCE sums (exact,
    * oracle-recomputable), and the two gate booleans: `container_ok`
    * (RIFF framing + geometry + fps + frame count survive the round
    * trip) and `mean_ok` (every decoded frame's mean within
    * [[AviMeanTol]] of its source frame — the lossy-codec claim). */
  final case class AviFrames(
      media_id: Long, w: Long, h: Long, n_frames: Long, n_sampled: Long,
      src_sampled_sum: Long, src_all_sum: Long,
      container_ok: Boolean, mean_ok: Boolean)

  /** Text bytes → up to [[AviMaxFrames]] 16×8 grayscale frames → each
    * encoded as a real baseline JPEG ([[MediaCodec.encodeJpegGray]]) →
    * wrapped in a genuine RIFF/AVI MJPEG container
    * ([[MediaCodec.encodeAviMjpeg]]) → full container parse + per-frame
    * JPEG decode → every-2nd-frame sampling. The frame-extraction/
    * frame-sampling stage of a video pipeline against an actual video
    * container; source sums are exact facts the oracle recomputes from
    * the bytes (the q99 construction), the lossy per-frame content
    * rides the `mean_ok` bound (the q72 construction). */
  def aviFrameSample(docs: DataFrame, idCol: String, textCol: String): Dataset[AviFrames] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val len = math.min(text.length, AviFrameBytes * AviMaxFrames)
          val nF = math.max(1, (len + AviFrameBytes - 1) / AviFrameBytes)
          val frames = (0 until nF).map { f =>
            val px = new Array[Byte](AviFrameBytes)
            val off = f * AviFrameBytes
            val n = math.max(0, math.min(AviFrameBytes, len - off))
            if (n > 0) System.arraycopy(text, off, px, 0, n)
            px
          }
          val jpegs = frames.map(
            MediaCodec.encodeJpegGray(AviFrameW, AviFrameH, _, JpegQuality))
          val avi = MediaCodec.encodeAviMjpeg(AviFrameW, AviFrameH, AviFps, jpegs)
          val (dw, dh, dfps, decJpegs) = MediaCodec.decodeAviMjpeg(avi)
          val containerOk = dw == AviFrameW && dh == AviFrameH &&
            dfps == AviFps && decJpegs.length == nF &&
            jpegs.zip(decJpegs).forall { case (a, b) =>
              java.util.Arrays.equals(a, b) // chunking is lossless
            }
          var meanOk = containerOk
          var srcAll = 0L
          var srcSampled = 0L
          frames.zipWithIndex.foreach { case (f, i) =>
            var s = 0L
            f.foreach(px => s += (px & 0xff))
            srcAll += s
            if (i % 2 == 0) srcSampled += s
            if (meanOk && i < decJpegs.length) {
              val (jw, jh, dec) = MediaCodec.decodeJpegGray(decJpegs(i))
              var ds = 0L
              dec.foreach(px => ds += (px & 0xff))
              meanOk = jw == AviFrameW && jh == AviFrameH &&
                math.abs(ds.toDouble / dec.length -
                  s.toDouble / f.length) <= AviMeanTol
            }
          }
          AviFrames(id, AviFrameW.toLong, AviFrameH.toLong, nF.toLong,
            (nF + 1L) / 2L, srcSampled, srcAll, containerOk, meanOk)
        }
      }
  }

  // ---- real resize / frame-sample (on the containers we decode) ------

  /** Nearest-neighbor grayscale downscale by integer factor `f`:
    * out(y, x) = in(y·f, x·f) — the standard decimating resize. */
  def downsampleGray(w: Int, h: Int, gray: Array[Byte], f: Int): (Int, Int, Array[Byte]) = {
    require(f >= 1 && gray.length == w * h)
    val w2 = (w + f - 1) / f
    val h2 = (h + f - 1) / f
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) { out(y * w2 + x) = gray(y * f * w + x * f); x += 1 }
      y += 1
    }
    (w2, h2, out)
  }

  /** Every f-th sample (audio frame-sampling / decimation; no
    * anti-alias filter — deterministic and oracle-computable). */
  def decimate(samples: Array[Short], f: Int): Array[Short] = {
    require(f >= 1)
    val n2 = (samples.length + f - 1) / f
    val out = new Array[Short](n2)
    var i = 0
    while (i < n2) { out(i) = samples(i * f); i += 1 }
    out
  }

  val ResizeFactor = 2
  val DecimateFactor = 4

  /** Raw EXACT integers out of the decode→transform chain — rounding
    * conventions (JVM rint = half-even, SQL round = half-up) must not
    * touch gate-crossing values, so derived signals (mean/RMS) are
    * computed and rounded in the Column layer where both engines
    * share semantics. */
  final case class ResampledMedia(
      media_id: Long, fmt: String, out_w: Long, out_h: Long,
      out_samples: Long, sum_gray: Long, sum_sq: Long)

  /** REAL decode → resize / frame-sample over the q55 containers:
    * BMPs downscale ×[[ResizeFactor]] (nearest neighbor), WAVs
    * decimate ×[[DecimateFactor]]; emits the exact gray sum of the
    * RESIZED image / squared-sample sum of the DECIMATED audio — both
    * recomputable from the source text bytes from first principles,
    * so the q70 oracle gates the whole decode→transform chain
    * content-exactly. Raw payloads pass through with zero geometry. */
  def resampleMedia(media: Dataset[(Long, Array[Byte])]): Dataset[ResampledMedia] = {
    import media.sparkSession.implicits._
    def raw(id: Long) = ResampledMedia(id, "raw", 0L, 0L, 0L, 0L, 0L)
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
          try {
            val (w, h, gray) = MediaCodec.decodeBmp(bytes)
            val (w2, h2, g2) = downsampleGray(w, h, gray, ResizeFactor)
            var sum = 0L
            g2.foreach(g => sum += (g & 0xff))
            ResampledMedia(id, "bmp", w2.toLong, h2.toLong, 0L, sum, 0L)
          } catch { case scala.util.control.NonFatal(_) => raw(id) }
        } else if (bytes.length >= 4 &&
            new String(bytes, 0, 4, "US-ASCII") == "RIFF") {
          try {
            val (_, samples) = MediaCodec.decodeWavPcm16(bytes)
            val dec = decimate(samples, DecimateFactor)
            var sq = 0L
            dec.foreach(s => sq += s.toLong * s)
            ResampledMedia(id, "wav", 0L, 0L, dec.length.toLong, 0L, sq)
          } catch { case scala.util.control.NonFatal(_) => raw(id) }
        } else raw(id)
      }
    }
  }

  /** Resize stub: metadata-only transform (a real one maps pixels);
    * shows the pruning-friendly layout — bytes column untouched. */
  def resize(media: Dataset[MediaRecord], maxDim: Int): DataFrame =
    media.toDF().withColumn("scale",
        least(lit(1.0d), lit(maxDim.toDouble) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
