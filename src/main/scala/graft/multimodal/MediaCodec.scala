package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real (non-stub) codecs for the two media containers that need no
  * native library: 24-bit uncompressed BMP and 16-bit PCM WAV. Pure
  * JVM byte-level encode/decode, so the multimodal pipeline exercises
  * a genuine bytes→pixels/samples step end-to-end in this container;
  * compressed formats (JPEG/H.264/...) remain honestly stubbed in
  * [[Multimodal.decodeStub]] — their codecs are not installable here.
  *
  * Layout references: BMP = BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER
  * (40 B) + bottom-up BGR rows padded to 4-byte multiples; WAV = RIFF
  * header + "fmt " PCM chunk + "data" chunk, all little-endian.
  */
object MediaCodec {

  // ImageIO's default stream factories are DISK-backed: every
  // createImageOutputStream / ImageIO.read spools through a temp file
  // (FileCache*ImageStream), which at one encode+decode per row turns
  // a per-document codec call into two filesystem round trips. All our
  // payloads are small in-memory byte arrays — force memory-cached
  // streams process-wide and hand ImageIO Memory* streams explicitly.
  // DELIBERATELY JVM-GLOBAL: setUseCache flips the default stream
  // factory for every ImageIO user in the process, triggered here by
  // class-init of the first codec call. In this engine that is the
  // wanted behavior (all ImageIO traffic is ours and in-memory); a
  // host application embedding this library alongside other ImageIO
  // users should set its own policy at its entry point, after which
  // this line is a no-op re-set of the same flag or is overridden by
  // whoever runs last — the explicit Memory*ImageStream wrappers below
  // keep OUR paths memory-backed either way.
  javax.imageio.ImageIO.setUseCache(false)

  // The registry scan (getImage{Writers,Readers}ByFormatName) plus
  // plugin instantiation costs more than a small encode itself when
  // paid per row. Writers/readers are not thread-safe but are fully
  // reusable after setOutput/setInput, so each executor thread keeps
  // one of each for life (bench-visible: q72 JPEG per-rep cost drops
  // ~3x at sf0.1). Never dispose() these — they are deliberately
  // thread-lifetime instances.
  private def tlWriter(fmt: String): ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial { () =>
      javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
    }
  private def tlReader(fmt: String): ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial { () =>
      javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
    }
  private val jpegWriterTL = tlWriter("jpeg")
  private val jpegReaderTL = tlReader("jpeg")
  private val gifWriterTL = tlWriter("gif")
  private val gifReaderTL = tlReader("gif")

  // ---- BMP (24-bit, uncompressed) ------------------------------------

  private def rowBytes(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a grayscale image (one byte per pixel, row-major top-down)
    * as a 24-bit BMP (r = g = b = gray). */
  def encodeBmp(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, s"${gray.length} != $width*$height")
    val rb = rowBytes(width)
    val size = 54 + rb * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    b.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0)     // planes, bpp, BI_RGB
      .putInt(rb * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val g = gray(y * width + x)
        b.put(g).put(g).put(g) // B G R
        x += 1
      }
      var pad = rb - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Decode a 24-bit uncompressed BMP to (width, height, gray) where
    * gray is the blue channel, row-major top-down. Throws on anything
    * that is not the exact container [[encodeBmp]] writes — a decoder
    * in a 100 TB pipeline must fail loudly, not emit garbage rows. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = b.getInt(10)
    val width = b.getInt(18)
    val height = b.getInt(22)
    require(b.getShort(28) == 24, "only 24-bit BMP supported")
    require(b.getInt(30) == 0, "only uncompressed BMP supported")
    require(width > 0 && height > 0, "top-down or empty BMP unsupported")
    val rb = rowBytes(width)
    require(bytes.length >= pixelOffset + rb * height, "truncated BMP")
    val gray = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val srcRow = pixelOffset + (height - 1 - y) * rb
      var x = 0
      while (x < width) {
        gray(y * width + x) = bytes(srcRow + x * 3) // blue channel
        x += 1
      }
      y += 1
    }
    (width, height, gray)
  }

  // ---- WAV (16-bit PCM, mono) ----------------------------------------

  /** Encode mono 16-bit PCM samples as a WAV container. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)              // PCM
      .putShort(1)              // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)   // byte rate
      .putShort(2)              // block align
      .putShort(16)             // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Decode a mono 16-bit PCM WAV to (sampleRate, samples). Same
    * fail-loudly contract as [[decodeBmp]]. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(new String(bytes, 12, 4, "US-ASCII") == "fmt ", "missing fmt chunk")
    require(b.getShort(20) == 1, "only PCM supported")
    require(b.getShort(22) == 1, "only mono supported")
    require(b.getShort(34) == 16, "only 16-bit supported")
    val sampleRate = b.getInt(24)
    require(new String(bytes, 36, 4, "US-ASCII") == "data", "missing data chunk")
    val dataLen = b.getInt(40)
    require(bytes.length >= 44 + dataLen, "truncated WAV")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = b.getShort(44 + i * 2); i += 1 }
    (sampleRate, samples)
  }

  // ---- G.711 μ-law (8-bit companded audio; WAV format code 7) --------
  //
  // The ITU-T G.711 μ-law compander: 14-bit linear PCM → 8 bits via a
  // piecewise-linear log approximation (sign + 3-bit exponent + 4-bit
  // mantissa, bias 0x84, ones-complement on the wire). Pure integer —
  // encode∘decode is an exact 256-entry function, which is what makes
  // the q324 oracle a shared lookup table instead of a float seam.

  private val MuBias = 0x84
  private val MuClip = 32635

  /** Encode one 16-bit PCM sample as a μ-law byte (G.711). */
  def muLawEncode(pcm: Short): Byte = {
    var s = pcm.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > MuClip) s = MuClip
    s += MuBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mantissa)).toByte
  }

  /** Decode one μ-law byte back to 16-bit PCM (G.711). */
  def muLawDecode(b: Byte): Short = {
    val u = (~b) & 0xff
    val exp = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + MuBias) << exp) - MuBias
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** Encode μ-law bytes as a WAV container with format code 7 — the
    * STRICTER chunk grammar G.711 WAVs carry in the wild: an extended
    * fmt chunk (18 bytes, cbSize = 0) plus a `fact` chunk with the
    * sample count before `data`, so a decoder that assumes the PCM
    * fixed layout (fmt at 12, data at 36) misparses it. */
  def encodeWavMuLaw(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val dataLen = samples.length
    // RIFF(12) + fmt(8+18) + fact(8+4) + data(8+n)
    val b = ByteBuffer.allocate(58 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(50 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7)              // WAVE_FORMAT_MULAW
      .putShort(1)              // mono
      .putInt(sampleRate)
      .putInt(sampleRate)       // byte rate (1 byte/sample)
      .putShort(1)              // block align
      .putShort(8)              // bits per sample
      .putShort(0)              // cbSize
    b.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.put(samples)
    b.array()
  }

  /** Decode a mono μ-law WAV to (sampleRate, 16-bit PCM samples) by an
    * honest chunk WALK (fmt/fact/data in any order, unknown chunks
    * skipped with odd-length padding) — fail-loudly like
    * [[decodeWavPcm16]]. */
  def decodeWavMuLaw(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var sampleRate = -1
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = b.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(b.getShort(off + 8) == 7, "not μ-law (fmt != 7)")
          require(b.getShort(off + 10) == 1, "only mono supported")
          require(b.getShort(off + 22) == 8, "μ-law must be 8-bit")
          sampleRate = b.getInt(off + 12)
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case _ => () // fact & friends: length-skipped
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    (sampleRate, data.map(muLawDecode))
  }

  // ---- PNG (8-bit RGB/RGBA, non-interlaced) --------------------------
  //
  // A COMPRESSED container with zero dependencies: PNG's DEFLATE layer
  // is java.util.zip (Deflater/Inflater/CRC32, in the JDK), so unlike
  // JPEG/H.264 it is implementable honestly here. Scope: bit depth 8,
  // color types 2 (RGB) / 6 (RGBA), no interlace — the decoder still
  // implements ALL FIVE scanline filters (None/Sub/Up/Average/Paeth),
  // because any conformant encoder may emit them per row.
  // Layout reference: RFC 2083 (signature; length/type/data/CRC chunks;
  // IHDR 13 bytes big-endian; IDAT zlib stream of filtered scanlines).

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode 8-bit pixels (row-major, `channels` = 3 RGB or 4 RGBA) as
    * a non-interlaced PNG. Rows are filter-type-0 (None) — simplest
    * valid stream; DEFLATE still compresses it for real. */
  def encodePng(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels=$channels")
    require(pixels.length == width * height * channels,
      s"${pixels.length} != $width*$height*$channels")
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0 // filter: None
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len, 0, 4)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)                                    // bit depth
      .put((if (channels == 3) 2 else 6).toByte)        // color type
      .put(0.toByte).put(0.toByte).put(0.toByte)        // deflate/adaptive/none
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a non-interlaced 8-bit RGB/RGBA PNG to (width, height,
    * channels, pixels). Validates the signature, every chunk CRC, the
    * IHDR invariants, and the inflated length; unfilters all five
    * scanline filter types. Same fail-loudly contract as
    * [[decodeBmp]]. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= PngSig.length + 12 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(bytes, PngSig.length), PngSig), "not a PNG")
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    b.position(PngSig.length)
    var width, height, channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(b.remaining() >= 12, "truncated PNG (chunk header)")
      val len = b.getInt()
      // Long arithmetic: a hostile len near Int.MaxValue would overflow
      // `len + 8` and defeat the truncation check before the allocation.
      require(len >= 0 && b.remaining().toLong >= len.toLong + 8L,
        "truncated PNG (chunk body)")
      val typBytes = new Array[Byte](4); b.get(typBytes)
      val typ = new String(typBytes, "US-ASCII")
      val data = new Array[Byte](len); b.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typBytes); crc.update(data)
      require(b.getInt() == crc.getValue.toInt, s"bad CRC in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          val h = ByteBuffer.wrap(data)
          width = h.getInt(); height = h.getInt()
          require(width > 0 && height > 0, "bad dimensions")
          require(h.get() == 8, "only bit depth 8 supported")
          channels = h.get() match {
            case 2 => 3
            case 6 => 4
            case ct => throw new IllegalArgumentException(
              s"only RGB/RGBA color types supported, got $ct")
          }
          require(h.get() == 0, "bad compression method")
          require(h.get() == 0, "bad filter method")
          require(h.get() == 0, "only non-interlaced supported")
        case "IDAT" => idat.write(data, 0, len)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunks skipped (CRC still checked)
      }
    }
    require(channels > 0, "missing IHDR")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val k = inflater.inflate(raw, off, raw.length - off)
      require(k > 0 || inflater.finished(), "bad IDAT stream")
      off += k
    }
    val extra = inflater.inflate(new Array[Byte](1))
    inflater.end()
    require(off == raw.length && extra == 0,
      s"IDAT length mismatch: got $off want ${raw.length}")
    // unfilter (RFC 2083 §6): a = left, b = up, c = upper-left
    val px = new Array[Byte](height * stride)
    val bpp = channels
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
      val po = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(ro + x) & 0xff
        val a = if (x >= bpp) px(po + x - bpp) & 0xff else 0
        val up = if (y > 0) px(po - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px(po - stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + (a + up) / 2
          case 4 =>
            val p = a + up - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - up), math.abs(p - c))
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case other => throw new IllegalArgumentException(s"bad filter $other")
        }
        px(po + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (width, height, channels, px)
  }

  // ---- JPEG (grayscale, via javax.imageio — ships in the JDK) --------
  //
  // The one LOSSY compressed format the JVM supports with zero added
  // dependencies: the JDK bundles a JPEG reader/writer (headless-safe;
  // no AWT display needed). Unlike BMP/WAV/PNG the round trip is not
  // bit-exact, so the oracle gate for JPEG carries exact GEOMETRY plus
  // a within-bound accuracy claim on the decoded mean (the q22/q48
  // pattern for approximate operators) — per-pixel sums are a property
  // of the codec's quantizer, not a recomputable fact.

  /** Encode a grayscale image (one byte per pixel, row-major top-down)
    * as a real baseline JPEG at the given quality (0..1). */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte],
      quality: Float): Array[Byte] = {
    require(gray.length == width * height, s"${gray.length} != $width*$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val out = new java.io.ByteArrayOutputStream()
    val writer = jpegWriterTL.get()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.setOutput(null); ios.close() }
    out.toByteArray
  }

  /** Decode a JPEG to (width, height, gray bytes) — luminance channel,
    * row-major top-down. Fails loudly on undecodable input (ImageIO
    * returns null or throws on corrupt streams), same contract as
    * [[decodeBmp]]. */
  def decodeJpegGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff, "not a JPEG")
    val reader = jpegReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val img =
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally { reader.setInput(null); iis.close() }
    require(img != null, "undecodable JPEG")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.getDataElements(0, 0, w, h, null)
          .asInstanceOf[Array[Byte]]
      else {
        // ITU-R BT.601 luma, the JPEG color model's Y channel
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val l = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff))
            out(y * w + x) = math.min(255, math.round(l)).toByte
            x += 1
          }
          y += 1
        }
        out
      }
    (w, h, gray)
  }

  // ---- GIF (multi-frame, JDK imageio) --------------------------------
  //
  // The animated-GIF container is the JVM's one real MULTI-FRAME
  // format — the closest native stand-in for video, so the
  // frame-extraction / frame-sampling pipeline stage can run against a
  // genuine container instead of a stub. GIF is palette-indexed: an
  // 8-bit grayscale frame has ≤256 distinct values, the writer builds
  // an exact gray palette, and the round trip is LOSSLESS — per-frame
  // pixel sums are oracle-recomputable facts (the PNG/q66 pattern, not
  // JPEG's within-bound claim).

  /** Encode grayscale frames (each one byte/pixel, row-major top-down,
    * same geometry) as a real multi-frame GIF via the JDK's bundled
    * writer (`prepareWriteSequence`/`writeToSequence`). */
  def encodeGifGray(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == width * height,
      s"${f.length} != $width*$height"))
    val out = new java.io.ByteArrayOutputStream()
    val writer = gifWriterTL.get()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val p = writer.getDefaultWriteParam
      // the JDK writer defaults to interlaced output, and its interlace
      // row mapping corrupts frames at some small heights (3-4 rows:
      // rows land shifted with zero gaps) — force non-interlaced, which
      // is also what a pipeline wants (sequential row access)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      frames.foreach { f =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, width, height, f)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
      }
      writer.endWriteSequence()
    } finally { writer.setOutput(null); ios.close() }
    out.toByteArray
  }

  // ---- AVI (MJPEG video-in-AVI, hand-rolled RIFF over the JDK JPEG) --
  //
  // A REAL video container with zero dependencies: AVI is RIFF (the
  // same chunk grammar as WAV, little-endian) and MJPEG frames are
  // plain baseline JPEGs — the JDK codec above. Layout per the
  // original VFW spec: RIFF('AVI ') { LIST('hdrl'){ avih,
  // LIST('strl'){ strh('vids'/'MJPG'), strf(BITMAPINFOHEADER) } },
  // LIST('movi'){ '00dc' <jpeg> ... }, 'idx1' }. Chunks pad to even
  // lengths. This upgrades frame sampling from the GIF stand-in to an
  // actual video container; the codec UNDER it is still the JVM's
  // JPEG, so per-pixel content carries q72's lossy contract.

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Wrap pre-encoded JPEG frames as an MJPEG AVI at `fps`. */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegFrames.nonEmpty, "no frames")
    val n = jpegFrames.length
    def pad(len: Int): Int = len + (len & 1)
    val moviBody = 4 + jpegFrames.map(f => 8 + pad(f.length)).sum
    val idx1Body = 16 * n
    val hdrlBody = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
    val b = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    b.put(fourCC("RIFF")).putInt(riffBody).put(fourCC("AVI "))
    // LIST hdrl
    b.put(fourCC("LIST")).putInt(hdrlBody).put(fourCC("hdrl"))
    val maxFrame = jpegFrames.map(_.length).max
    b.put(fourCC("avih")).putInt(56)
      .putInt(1000000 / fps)            // dwMicroSecPerFrame
      .putInt(maxFrame * fps)           // dwMaxBytesPerSec
      .putInt(0)                        // dwPaddingGranularity
      .putInt(0x10)                     // dwFlags: AVIF_HASINDEX
      .putInt(n)                        // dwTotalFrames
      .putInt(0).putInt(1)              // dwInitialFrames, dwStreams
      .putInt(maxFrame)                 // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
    // LIST strl
    b.put(fourCC("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fourCC("strl"))
    b.put(fourCC("strh")).putInt(56)
      .put(fourCC("vids")).put(fourCC("MJPG"))
      .putInt(0).putShort(0).putShort(0) // dwFlags, wPriority, wLanguage
      .putInt(0)                         // dwInitialFrames
      .putInt(1).putInt(fps)             // dwScale / dwRate = frame rate
      .putInt(0).putInt(n)               // dwStart, dwLength (frames)
      .putInt(maxFrame)                  // dwSuggestedBufferSize
      .putInt(-1).putInt(0)              // dwQuality, dwSampleSize
      .putShort(0).putShort(0)           // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    b.put(fourCC("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)          // biPlanes, biBitCount
      .put(fourCC("MJPG"))               // biCompression
      .putInt(width * height * 3)        // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    b.put(fourCC("LIST")).putInt(moviBody).put(fourCC("movi"))
    val offsets = new Array[Int](n)
    jpegFrames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = b.position() - 12 - (8 + hdrlBody) - 8 // rel. to 'movi'
      b.put(fourCC("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) b.put(0.toByte)
    }
    // idx1: one entry per frame, offsets relative to the movi list tag
    b.put(fourCC("idx1")).putInt(idx1Body)
    jpegFrames.zipWithIndex.foreach { case (f, i) =>
      b.put(fourCC("00dc")).putInt(0x10).putInt(offsets(i)).putInt(f.length)
    }
    b.array()
  }

  /** Parse an MJPEG AVI to (width, height, fps, per-frame JPEG bytes).
    * Validates the RIFF/AVI framing, the declared stream geometry, the
    * MJPG fourcc, chunk bounds, and that the '00dc' frame count equals
    * the avih dwTotalFrames. Same fail-loudly contract as the other
    * decoders — a video pipeline must reject torn containers, not emit
    * garbage frames. */
  def decodeAviMjpeg(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riffEnd = {
      val sz = b.getInt(4)
      require(sz >= 4 && 8 + sz <= bytes.length, "truncated AVI (RIFF size)")
      8 + sz
    }
    var pos = 12
    var width, height, fps, declared = -1
    var sawMjpg = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def chunkId(p: Int) = new String(bytes, p, 4, "US-ASCII")
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = chunkId(p)
        val len = b.getInt(p + 4)
        require(len >= 0 && p + 8 + len <= to, s"truncated AVI ($id chunk)")
        id match {
          case "LIST" =>
            val kind = chunkId(p + 8)
            walk(p + 12, p + 8 + len, inMovi = kind == "movi")
          case "avih" =>
            require(len >= 40, "short avih")
            declared = b.getInt(p + 8 + 16)
            width = b.getInt(p + 8 + 32)
            height = b.getInt(p + 8 + 36)
            val usPerFrame = b.getInt(p + 8)
            require(usPerFrame > 0, "bad frame rate")
            fps = 1000000 / usPerFrame
          case "strh" =>
            require(len >= 8, "short strh")
            if (chunkId(p + 8) == "vids")
              sawMjpg = chunkId(p + 12) == "MJPG"
          case "00dc" if inMovi =>
            frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)
          case _ => () // strf/idx1/other streams: bounds already checked
        }
        p += 8 + len + (len & 1)
      }
    }
    walk(12, riffEnd, inMovi = false)
    require(width > 0 && height > 0, "missing avih geometry")
    require(sawMjpg, "not an MJPEG video stream")
    require(declared == frames.length,
      s"frame count mismatch: avih says $declared, movi has ${frames.length}")
    (width, height, fps, frames.toSeq)
  }

  /** Decode every frame of a GIF to (width, height, frames) — gray
    * bytes per frame, row-major top-down. Fails loudly on corrupt
    * input (bad magic, truncation), same contract as the other
    * decoders. */
  def decodeGifFrames(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    require(bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a', "not a GIF")
    val reader = gifReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n >= 1, "no frames in GIF")
      val frames = (0 until n).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // indexed model with a gray palette: r == g == b == gray
            gray(y * w + x) = ((img.getRGB(x, y) >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        gray
      }
      val head = reader.read(0)
      (head.getWidth, head.getHeight, frames)
    } finally { reader.setInput(null); iis.close() }
  }
}
