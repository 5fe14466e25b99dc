package graft.multimodal

import graft.SparkSpec

import scala.util.Random

class DecodeSpec extends SparkSpec {

  test("BMP round-trip: encode→decode restores pixels (incl. padded widths)") {
    val rnd = new Random(5)
    for (w <- Seq(1, 5, 7, 16); h <- Seq(1, 3, 10)) {
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val (dw, dh, back) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, gray))
      assert(dw == w && dh == h && back.sameElements(gray), s"w=$w h=$h")
    }
  }

  test("WAV round-trip: encode→decode restores samples and rate") {
    val rnd = new Random(6)
    for (n <- Seq(0, 1, 17, 400)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val (rate, back) =
        MediaCodec.decodeWavPcm16(MediaCodec.encodeWavPcm16(8000, samples))
      assert(rate == 8000 && back.sameElements(samples), s"n=$n")
    }
  }

  test("corrupt containers fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp("BMnot-actually-a-bitmap".getBytes)
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(Array[Byte](1, 2, 3))
    }
    val wav = MediaCodec.encodeWavPcm16(8000, Array.fill(10)(1.toShort))
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWavPcm16(wav.take(50)) // truncated data chunk
    }
  }

  test("PNG round-trip: RGB and RGBA, assorted geometries") {
    val rnd = new Random(7)
    for (ch <- Seq(3, 4); (w, h) <- Seq((1, 1), (16, 5), (7, 3), (33, 2))) {
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val (dw, dh, dch, back) = MediaCodec.decodePng(MediaCodec.encodePng(w, h, ch, px))
      assert(dw == w && dh == h && dch == ch && back.sameElements(px),
        s"w=$w h=$h ch=$ch")
    }
  }

  test("PNG decoder unfilters all five scanline filter types") {
    // hand-build a filtered raw stream (filters 0-4, one per row) and
    // the expected unfiltered pixels via an independent reference
    // unfilter, then wrap it in chunks and decode
    val rnd = new Random(8)
    val (w, h, ch) = (6, 5, 3)
    val stride = w * ch
    val px = Array.fill(h * stride)(rnd.nextInt(256).toByte)
    // reference FILTER pass (RFC 2083 §6 forward direction)
    val raw = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = px(y * stride + x) & 0xff
        val a = if (x >= ch) px(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) px((y - 1) * stride + x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - up), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    // deflate + wrap in signature/IHDR/IDAT/IEND with correct CRCs
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val (dw, dh, dch, back) = MediaCodec.decodePng(out.toByteArray)
    assert(dw == w && dh == h && dch == ch && back.sameElements(px))
  }

  test("downsample and decimate pick exactly the nearest-neighbor elements") {
    // hand-checkable 4x3 image, factor 2: out(y,x) = in(2y, 2x)
    val gray = Array.tabulate(12)(i => i.toByte) // w=4, h=3
    val (w2, h2, g2) = Multimodal.downsampleGray(4, 3, gray, 2)
    assert(w2 == 2 && h2 == 2)
    assert(g2.toSeq == Seq[Byte](0, 2, 8, 10))
    // non-divisible width keeps the ceil column
    val (w3, h3, g3) = Multimodal.downsampleGray(5, 1, Array.tabulate(5)(_.toByte), 2)
    assert(w3 == 3 && h3 == 1 && g3.toSeq == Seq[Byte](0, 2, 4))
    val dec = Multimodal.decimate(Array.tabulate(10)(_.toShort), 4)
    assert(dec.toSeq == Seq[Short](0, 4, 8))
    assert(Multimodal.decimate(Array.empty[Short], 4).isEmpty)
  }

  test("resample pipeline: sums match source bytes through decode+transform") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "abcdefgh" * 40),   // bmp (320 chars, capped at 240)
      (1L, "xyz" * 50),        // wav
      (2L, "raw passthrough")) // raw
      .toDF("doc_id", "text")
    val enc = Multimodal.encodedMedia(docs, "doc_id", "text")
    val got = Multimodal.resampleMedia(enc).collect()
      .map(r => r.media_id -> r).toMap
    // bmp: gray = first 240 bytes zero-padded to 16x15; downscale by 2
    val text0 = ("abcdefgh" * 40).getBytes("UTF-8").take(240)
    val h = 15
    var want0 = 0L
    for (y2 <- 0 until (h + 1) / 2; x2 <- 0 until 8) {
      val idx = 2 * y2 * 16 + 2 * x2
      want0 += (if (idx < text0.length) text0(idx) & 0xff else 0)
    }
    assert(got(0L).fmt == "bmp" && got(0L).out_w == 8 &&
      got(0L).out_h == 8 && got(0L).sum_gray == want0)
    // wav: samples from first 150 bytes, decimated by 4
    val text1 = ("xyz" * 50).getBytes("UTF-8")
    val want1 = text1.indices.filter(_ % 4 == 0).map { i =>
      val s16 = ((text1(i) & 0xff) - 128) * 256L
      s16 * s16
    }.sum
    assert(got(1L).fmt == "wav" && got(1L).out_samples == 38 &&
      got(1L).sum_sq == want1)
    assert(got(2L).fmt == "raw" && got(2L).sum_gray == 0 && got(2L).sum_sq == 0)
  }

  test("PNG ancillary chunks are skipped (CRC still checked); wrong color types rejected") {
    val px = Array.fill(4 * 2 * 3)(9.toByte)
    val good = MediaCodec.encodePng(4, 2, 3, px)
    // splice a tEXt chunk (valid CRC) after IHDR: sig(8) + IHDR chunk(12+13)
    val ihdrEnd = 8 + 12 + 13
    val data = "comment".getBytes("US-ASCII")
    val t = "tEXt".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    val spliced = good.take(ihdrEnd) ++ chunk ++ good.drop(ihdrEnd)
    val (w, h, ch, back) = MediaCodec.decodePng(spliced)
    assert(w == 4 && h == 2 && ch == 3 && back.sameElements(px))
    // corrupt the spliced chunk's CRC → rejected even though ancillary
    val bad = spliced.clone()
    bad(ihdrEnd + chunk.length - 1) = (bad(ihdrEnd + chunk.length - 1) ^ 1).toByte
    intercept[IllegalArgumentException] { MediaCodec.decodePng(bad) }
    // grayscale (color type 0) is out of scope and must say so — flip
    // the IHDR color-type byte AND recompute its CRC, so the rejection
    // is the color-type check, not an incidental CRC failure
    val gray = good.clone()
    gray(8 + 8 + 9) = 0.toByte // IHDR color-type byte
    val ic = new java.util.zip.CRC32()
    ic.update(gray, 12, 4 + 13) // IHDR type + data
    java.nio.ByteBuffer.wrap(gray, 8 + 8 + 13, 4).putInt(ic.getValue.toInt)
    val err = intercept[IllegalArgumentException] { MediaCodec.decodePng(gray) }
    assert(err.getMessage.contains("color type"), err.getMessage)
  }

  test("corrupt PNGs fail loudly: bad magic, flipped CRC, truncated stream") {
    val px = Array.fill(16 * 2 * 3)(7.toByte)
    val good = MediaCodec.encodePng(16, 2, 3, px)
    intercept[IllegalArgumentException] {
      MediaCodec.decodePng("not a png at all".getBytes)
    }
    val badCrc = good.clone()
    badCrc(badCrc.length - 13) = (badCrc(badCrc.length - 13) ^ 0x7f).toByte // inside IDAT tail/CRC region
    intercept[IllegalArgumentException] { MediaCodec.decodePng(badCrc) }
    intercept[IllegalArgumentException] {
      MediaCodec.decodePng(good.take(good.length - 20)) // truncated
    }
  }

  test("pipeline decode fidelity: BMP mean gray / WAV RMS match the source bytes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val enc = Multimodal.encodedMedia(docs, "doc_id", "text")
    val got = Multimodal.decodeMedia(enc).collect()
      .map(d => d.media_id -> d).toMap
    val src = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").getBytes("UTF-8"))
    assert(src.nonEmpty)
    src.foreach { case (id, text) =>
      val d = got(id)
      (id % 3) match {
        case 0 =>
          val len = math.min(text.length, Multimodal.BmpMaxBytes)
          val h = math.max(1, (len + Multimodal.BmpWidth - 1) / Multimodal.BmpWidth)
          val padded = java.util.Arrays.copyOf(text, Multimodal.BmpWidth * h)
          val mean = padded.map(_ & 0xff).sum.toDouble / padded.length
          assert(d.fmt == "bmp" && math.abs(d.mean_signal - mean) < 1e-5, s"id=$id")
        case 1 =>
          val n = math.min(text.length, Multimodal.WavMaxSamples)
          val sq = text.take(n).map(b => ((b & 0xff) - 128) * 256.0)
            .map(s => s * s).sum
          val rms = if (n == 0) 0d else math.sqrt(sq / n)
          assert(d.fmt == "wav" && math.abs(d.mean_signal - rms) < 1e-4, s"id=$id")
        case _ =>
          assert(d.fmt == "raw" && d.n_bytes == text.length.toLong, s"id=$id")
      }
    }
  }

  test("JPEG round-trip: geometry exact, decoded mean within the gate bound") {
    val rnd = new Random(71)
    var worst = 0.0
    // the three hardest contents for a lossy codec: high-frequency
    // noise, sharp step edges, smooth gradient — across geometries
    val contents = Seq[Int => Int](
      _ => rnd.nextInt(256),                   // noise
      i => if (i % 16 < 8) 0 else 255,         // edges
      i => i % 256)                            // gradient
    for (h <- Seq(1, 3, 15); (gen, ci) <- contents.zipWithIndex) {
      val w = Multimodal.JpegWidth
      val gray = Array.tabulate(w * h)(i => gen(i).toByte)
      val jpeg = MediaCodec.encodeJpegGray(w, h, gray, Multimodal.JpegQuality)
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "not a JPEG stream")
      val (dw, dh, dec) = MediaCodec.decodeJpegGray(jpeg)
      assert(dw == w && dh == h, s"geometry drifted: $dw x $dh vs $w x $h (c$ci)")
      assert(dec.length == w * h)
      val srcMean = gray.map(_ & 0xff).sum.toDouble / gray.length
      val decMean = dec.map(_ & 0xff).sum.toDouble / dec.length
      val err = math.abs(decMean - srcMean)
      worst = math.max(worst, err)
      assert(err <= Multimodal.JpegMeanTol, s"mean drift $err (c$ci h=$h)")
    }
    // the tolerance claim in the q72 scaladoc: observed worst case is
    // well inside the bound, not riding its edge
    assert(worst <= Multimodal.JpegMeanTol / 2, s"tolerance margin thin: $worst")
  }

  test("corrupt JPEGs fail loudly: bad magic, truncated stream") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeJpegGray("BM25 is not a JPEG".getBytes)
    }
    val good = MediaCodec.encodeJpegGray(16, 4,
      Array.tabulate(64)(_.toByte), 0.9f)
    intercept[Exception] {
      MediaCodec.decodeJpegGray(good.take(good.length / 2)) // truncated
    }
  }

  test("decodeMedia routes JPEG payloads and falls back raw on corrupt ones") {
    val s = spark
    import s.implicits._
    val jpeg = MediaCodec.encodeJpegGray(16, 2,
      Array.tabulate(32)(i => (i * 8).toByte), 0.95f)
    // 0xFFD8FF prefix on garbage: must not crash the job — raw fallback
    val liar = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "definitely not a jpeg body".getBytes
    val media = Seq((1L, jpeg), (2L, liar)).toDS()
    val out = Multimodal.decodeMedia(media).collect().sortBy(_.media_id)
    assert(out(0).fmt == "jpeg" && out(0).w == 16 && out(0).h == 2)
    assert(out(1).fmt == "raw" && out(1).n_bytes == liar.length.toLong)
  }

  test("GIF multi-frame round-trip is lossless, frames in order") {
    val rnd = new scala.util.Random(7)
    for (nFrames <- Seq(1, 2, 4, 7); (w, h) <- Seq((16, 8), (5, 3))) {
      val frames = (0 until nFrames).map { _ =>
        val a = new Array[Byte](w * h); rnd.nextBytes(a); a
      }
      val gif = MediaCodec.encodeGifGray(w, h, frames)
      val (dw, dh, dec) = MediaCodec.decodeGifFrames(gif)
      assert(dw == w && dh == h && dec.length == nFrames)
      frames.zip(dec).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"${w}x$h n=$nFrames")
      }
    }
  }

  test("corrupt GIFs fail loudly: bad magic, truncation") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeGifFrames("PNG is not a GIF either".getBytes)
    }
    val good = MediaCodec.encodeGifGray(8, 8,
      Seq(Array.tabulate(64)(_.toByte), Array.tabulate(64)(i => (255 - i).toByte)))
    intercept[Exception] {
      MediaCodec.decodeGifFrames(good.take(20)) // header only
    }
  }

  test("gifFrameSample: sums recompute from source bytes; zero-pad contributes 0") {
    val s = spark
    import s.implicits._
    val text = Array.tabulate(300)(i => ((i * 7) % 256).toByte) // 3 frames, last padded
    val docs = Seq((5L, new String(text.map(b => (((b & 0xff) % 94) + 32).toChar)))).toDF("doc_id", "text")
    val out = Multimodal.gifFrameSample(docs, "doc_id", "text").collect().head
    val bytes = docs.select("text").as[String].head().getBytes("UTF-8")
    val len = math.min(bytes.length, 512)
    val all = bytes.take(len).map(_ & 0xff).map(_.toLong).sum
    val sampled = bytes.take(len).zipWithIndex
      .filter { case (_, k) => (k / 128) % 2 == 0 }.map(_._1 & 0xff).map(_.toLong).sum
    assert(out.lossless)
    assert(out.n_frames == math.max(1, (len + 127) / 128))
    assert(out.all_sum == all)
    assert(out.sampled_sum == sampled)
    assert(out.n_sampled == (out.n_frames + 1) / 2)
  }

  // ---- MJPEG-in-AVI ----------------------------------------------------

  test("AVI round-trip: container framing, geometry, fps, byte-exact payloads") {
    val rnd = new scala.util.Random(11)
    for (nFrames <- Seq(1, 2, 4, 7); (w, h) <- Seq((16, 8), (5, 3))) {
      val jpegs = (0 until nFrames).map { _ =>
        val px = new Array[Byte](w * h); rnd.nextBytes(px)
        MediaCodec.encodeJpegGray(w, h, px, 0.95f)
      }
      val avi = MediaCodec.encodeAviMjpeg(w, h, 10, jpegs)
      val (dw, dh, fps, dec) = MediaCodec.decodeAviMjpeg(avi)
      assert(dw == w && dh == h && fps == 10 && dec.length == nFrames)
      jpegs.zip(dec).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"${w}x$h n=$nFrames")
      }
      // and the extracted payloads decode as the JPEGs they are
      val (jw, jh, _) = MediaCodec.decodeJpegGray(dec.head)
      assert(jw == w && jh == h)
    }
  }

  test("corrupt AVIs fail loudly: bad magic, truncation, frame-count lie") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeAviMjpeg("RIFFxxxxWAVE not a video".getBytes)
    }
    val jpeg = MediaCodec.encodeJpegGray(8, 8, Array.tabulate(64)(_.toByte), 0.95f)
    val good = MediaCodec.encodeAviMjpeg(8, 8, 10, Seq(jpeg, jpeg))
    intercept[Exception] { MediaCodec.decodeAviMjpeg(good.take(40)) }
    // a torn movi list (one frame chunk missing) must trip the
    // avih-vs-movi frame-count cross-check, not silently emit 1 frame
    val oneFrame = MediaCodec.encodeAviMjpeg(8, 8, 10, Seq(jpeg))
    val lied = oneFrame.clone()
    // dwTotalFrames lives at avih body offset 16; avih body starts at
    // RIFF(12) + LIST hdr(12) + 'avih'+size(8) = 32
    lied(32 + 16) = 2
    intercept[IllegalArgumentException] { MediaCodec.decodeAviMjpeg(lied) }
  }

  test("aviFrameSample: source sums exact, container+mean gates hold") {
    val s = spark
    import s.implicits._
    val text = Array.tabulate(300)(i => ((i * 7) % 94 + 32).toByte) // 3 frames
    val docs = Seq((5L, new String(text, "US-ASCII")),
      (6L, "")).toDF("doc_id", "text")
    val out = Multimodal.aviFrameSample(docs, "doc_id", "text")
      .collect().sortBy(_.media_id)
    val bytes = text
    val len = math.min(bytes.length, 512)
    val all = bytes.take(len).map(_ & 0xff).map(_.toLong).sum
    val sampled = bytes.take(len).zipWithIndex
      .filter { case (_, k) => (k / 128) % 2 == 0 }.map(_._1 & 0xff).map(_.toLong).sum
    val r5 = out(0)
    assert(r5.container_ok && r5.mean_ok)
    assert(r5.n_frames == 3 && r5.n_sampled == 2)
    assert(r5.src_all_sum == all && r5.src_sampled_sum == sampled)
    val r6 = out(1) // empty text: one zero-padded frame
    assert(r6.container_ok && r6.mean_ok)
    assert(r6.n_frames == 1 && r6.src_all_sum == 0)
  }
}
