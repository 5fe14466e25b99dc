package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Acoustic fingerprint near-dup: the audio member of the dedup family
  * (q206's dHash is the visual one) — a 64-bit energy-gradient
  * fingerprint over REALLY-decoded PCM, the integer-exact skeleton of
  * the Haitsma-Kalker / Chromaprint family (those compare energies of
  * adjacent spectral bands; this compares energies of adjacent time
  * frames — same sign-of-gradient bit construction, no FFT so the
  * cross-engine gate stays integer-exact).
  *
  * Pipeline: audio docs (doc_id % 3 == 1, the q55 role split) carry
  * PCM samples `(code − 128) · 256` of the doc's sanitized text
  * codes, capped at [[Multimodal.WavMaxSamples]]; the samples are
  * ENCODED to a real RIFF/WAV container and DECODED back
  * ([[MediaCodec.decodeWavPcm16]] — the codec is in the gated path),
  * split into 65 integer-floor frames, and hashed: bit k =
  * energy(k) > energy(k+1) where energy is the frame's Σ|sample| —
  * all integers. A perturbed TWIN of every clip (every [[Stride]]-th
  * sample replaced by a [[Spike]] transient — ≤ 2 samples at the cap,
  * ≤ 2 frames touched, ≤ 4 flipped bits) models the re-mastered /
  * transient-damaged duplicate.
  *
  * Detection reuses [[ImageDedup.nearDupPairs]] verbatim: 8 disjoint
  * 8-bit bands, Hamming ≤ 7 ⇒ pigeonhole band collision, exhaustive
  * against the oracle's brute force.
  */
object AudioDedup {

  /** Every Stride-th sample (1-based) becomes a [[Spike]] in the twin:
    * ≤ 2 of the ≤ 400 samples. */
  val Stride = 151
  /** Transient amplitude injected at perturbed positions. */
  val Spike = 32000

  /** `(img_id, dhash)` for every audio doc AND its perturbed twin —
    * schema-compatible with [[ImageDedup.nearDupPairs]]. */
  def audioHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol) % 3 === 1)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val s = ImageDedup.sanitize(text)
        val n = math.min(s.length, Multimodal.WavMaxSamples)
        Seq((id, false), (id + ImageDedup.TwinOffset, true)).map { case (hid, twin) =>
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) =
              if (twin && (i + 1) % Stride == 0) Spike.toShort
              else ((s.charAt(i).toInt - 128) * 256).toShort
            i += 1
          }
          val (_, decoded) = MediaCodec.decodeWavPcm16(
            MediaCodec.encodeWavPcm16(Multimodal.WavRate, samples))
          // 65 integer-floor frames; energy = Σ|sample| (exact ints)
          val e = new Array[Long](65)
          var f = 0
          while (f < 65) {
            var j = f * n / 65
            val end = (f + 1) * n / 65
            var acc = 0L
            while (j < end) { acc += math.abs(decoded(j).toLong); j += 1 }
            e(f) = acc
            f += 1
          }
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (e(k) > e(k + 1)) hash |= 1L << k
            k += 1
          }
          (hid, hash)
        }
      }.toDF("img_id", "dhash")
  }
}
