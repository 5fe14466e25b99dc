package graft.multimodal

import graft.SparkSpec

/** What the q215 oracle alone cannot localize: the per-frame hash
  * convention (container round trip included), the banded detector's
  * EXHAUSTIVENESS against a driver-side brute force over equal-length
  * pairs, and the planted twins' guaranteed detection margin under
  * the length-scaled Hamming budget. */
class VideoDedupSpec extends SparkSpec {

  import VideoDedup._
  import Multimodal.{AviFrameBytes, AviMaxFrames}

  /** Driver-side reference frame-hash sequence over the raw
    * (pre-container) byte convention — independent arithmetic, no
    * MediaCodec. */
  private def refHashes(text: String, twin: Boolean): Seq[Long] = {
    val s = ImageDedup.sanitize(text)
    val len = math.min(s.length, AviFrameBytes * AviMaxFrames)
    val nf = math.max(1, (len + AviFrameBytes - 1) / AviFrameBytes)
    def code(idx: Int): Int =
      if (idx >= len) 0
      else if (twin && (idx + 1) % Stride == 0) 126
      else s.charAt(idx).toInt
    (0 until nf).map { f =>
      def samp(r: Int, c: Int): Int =
        code(f * AviFrameBytes + r * 16 + c * 16 / 9)
      (for {
        r <- 0 until 8
        c <- 0 until 8
        if samp(r, c) > samp(r, c + 1)
      } yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)
    }
  }

  test("frame hashes through the container equal the independent reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "badc fehg jilk nmpo qsru wvyx"),       // 1 frame, gradients
      (4L, "The quick brown fox jumps over the lazy dog. " * 6), // 3 frames
      (7L, "z" * 600),                             // cap: 512 bytes, 4 frames
      (10L, ""),                                   // empty → one zero frame
      (13L, "émoji ☃ stripped but ascii kept " * 5)) // sanitization live
      .toDF("doc_id", "text")
    val got = videoHashes(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      Seq(false, true).foreach { twin =>
        val hid = if (twin) id + TwinOffset else id
        val ref = refHashes(text, twin)
        ref.zipWithIndex.foreach { case (h, f) =>
          val (nf, hash) = got((hid, f.toLong))
          assert(nf == ref.length && hash == h,
            s"frame $f of video $hid: got $hash, reference $h")
        }
      }
    }
  }

  test("banded detector equals driver-side brute force over equal-length pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = videoHashes(docs, "doc_id", "text")
    val sigs = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        (id, rows.head._2, rows.sortBy(_._3).map(_._4).toVector)
      }.toSeq.sortBy(_._1)
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if sigs(i)._2 == sigs(j)._2 // equal frame count
      ham = sigs(i)._3.zip(sigs(j)._3)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      if ham <= 2 * sigs(i)._2 + 1
    } yield (sigs(i)._1, sigs(j)._1, ham.toLong)).toSeq.sorted
    val got = nearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq.sorted
    assert(got.nonEmpty && got == brute)
  }

  test("every planted twin is detected within the length-scaled budget") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nVideos = docs.filter("doc_id % 3 = 1").count()
    val twinRows = nearDupPairs(videoHashes(docs, "doc_id", "text"))
      .filter("twin_pair").collect()
    assert(twinRows.length == nVideos,
      s"${twinRows.length} of $nVideos twins detected — pigeonhole broken")
    twinRows.foreach { r =>
      assert(r.getLong(3) <= 2 * r.getLong(2) + 1,
        s"twin pair ${r.getLong(0)} at hamming ${r.getLong(3)} " +
          s"exceeds the scaled budget for ${r.getLong(2)} frames")
    }
  }
}
