package graft.multimodal

import graft.SparkSpec

/** q207's spec-side gates: hash convention via an independent
  * reference (no codec, no shared helpers), brute-force exhaustiveness
  * of the reused banded detector on the AUDIO hash distribution, and
  * the planted-twin margin. */
class AudioDedupSpec extends SparkSpec {

  import AudioDedup._

  private def refHash(text: String, twin: Boolean): Long = {
    val s = ImageDedup.sanitize(text)
    val n = math.min(s.length, Multimodal.WavMaxSamples)
    def absSamp(i: Int): Long = // i is 0-based
      if (twin && (i + 1) % Stride == 0) Spike.toLong
      else math.abs((s.charAt(i).toInt - 128).toLong * 256)
    def energy(f: Int): Long =
      (f * n / 65 until (f + 1) * n / 65).map(absSamp).sum
    (for { k <- 0 until 64 if energy(k) > energy(k + 1) }
      yield 1L << k).foldLeft(0L)(_ | _)
  }

  test("hash through the WAV codec equals the independent reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "soft loud SOFT LOUD soft loud patterns make gradients here"),
      (4L, "a" * 500),                       // cap: only first 400 samples
      (7L, ""),                              // empty clip → hash 0
      (10L, "Mixed punctuation!!! And spaces   and Tabs\tand CAPS"),
      (13L, "ünïcödé gets stripped ☃ before sampling"))
      .toDF("doc_id", "text")
    val got = audioHashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(got(id) == refHash(text, twin = false), s"base hash mismatch for doc $id")
      assert(got(id + ImageDedup.TwinOffset) == refHash(text, twin = true),
        s"twin hash mismatch for doc $id")
    }
  }

  test("banded detector is exhaustive on audio hashes (equals brute force)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = audioHashes(docs, "doc_id", "text")
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if ham <= ImageDedup.Tau
    } yield (hs(i)._1, hs(j)._1, ham.toLong)).toSeq.sorted
    val got = ImageDedup.nearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got.nonEmpty && got == brute)
  }

  test("every planted twin is detected within the transient design margin") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nClips = docs.filter("doc_id % 3 = 1").count()
    val twins = ImageDedup.nearDupPairs(audioHashes(docs, "doc_id", "text"))
      .filter("twin_pair").collect()
    assert(twins.length == nClips,
      s"${twins.length} of $nClips twins detected — pigeonhole broken")
    // ≤ 2 spiked samples at the 400-sample cap, each touching one
    // frame → ≤ 2 frames → ≤ 4 flipped gradient bits
    twins.foreach(r => assert(r.getLong(2) <= 4L,
      s"twin pair ${r.getLong(0)} at hamming ${r.getLong(2)} exceeds the design bound"))
  }
}
