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
}
