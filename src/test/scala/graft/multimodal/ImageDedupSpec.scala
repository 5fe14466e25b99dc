package graft.multimodal

import graft.SparkSpec

/** What the q206 oracle alone cannot localize: the hash convention
  * (grid geometry, gradient bit order), the banded detector's
  * EXHAUSTIVENESS against a driver-side brute force, and the planted
  * twins' guaranteed detection margin.
  */
class ImageDedupSpec extends SparkSpec {

  import ImageDedup._

  /** Driver-side reference dHash over the raw (pre-codec) pixel
    * convention — an INDEPENDENT formulation (no MediaCodec, no grid
    * helper reuse beyond arithmetic). */
  private def refHash(text: String, twin: Boolean): Long = {
    val s = sanitize(text)
    val len = math.min(s.length, Multimodal.BmpMaxBytes)
    val h = math.max(1, (len + Multimodal.BmpWidth - 1) / Multimodal.BmpWidth)
    def code(idx: Int): Int =
      if (idx >= len) 0
      else if (twin && (idx + 1) % Stride == 0) 126
      else s.charAt(idx).toInt
    def samp(r: Int, c: Int): Int =
      code((r * h / 8) * Multimodal.BmpWidth + c * Multimodal.BmpWidth / 9)
    (for {
      r <- 0 until 8
      c <- 0 until 8
      if samp(r, c) > samp(r, c + 1)
    } yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)
  }

  test("hash through the codec equals the independent pre-codec reference") {
    import spark.implicits._
    val docs = Seq(
      (0L, "badc fehg jilk nmpo qsru wvyx"), // non-monotonic gradients
      (3L, "The quick brown fox jumps over the lazy dog, twice over!"),
      (6L, "z" * 300),                       // cap: only first 240 pixels count
      (9L, ""),                              // empty → all-zero image
      (12L, "émoji ☃ stripped but ascii kept")) // sanitization live
      .toDF("doc_id", "text")
    val got = imageHashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(got(id) == refHash(text, twin = false), s"base hash mismatch for doc $id")
      assert(got(id + TwinOffset) == refHash(text, twin = true),
        s"twin hash mismatch for doc $id")
    }
  }

  test("banded detector equals driver-side brute force (exhaustive, no misses)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = imageHashes(docs, "doc_id", "text")
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if ham <= Tau
    } yield (hs(i)._1, hs(j)._1, ham.toLong)).toSeq.sorted
    val got = nearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got.nonEmpty && got == brute)
  }

  test("every planted twin is detected with the designed margin (ham <= 6 < Tau+1)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nImages = docs.filter("doc_id % 3 = 0").count()
    val twinRows = nearDupPairs(imageHashes(docs, "doc_id", "text"))
      .filter("twin_pair").collect()
    assert(twinRows.length == nImages,
      s"${twinRows.length} of $nImages twins detected — pigeonhole broken")
    twinRows.foreach { r =>
      assert(r.getLong(2) <= 2L * (Multimodal.BmpMaxBytes / Stride),
        s"twin pair ${r.getLong(0)} at hamming ${r.getLong(2)} exceeds the design bound")
    }
  }
}
