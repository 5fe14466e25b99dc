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
}
