package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Energy-threshold voice-activity segmentation over REALLY-decoded
  * PCM — the segmentation member of the audio family ([[AudioDedup]]
  * fingerprints whole clips; VAD cuts a clip into active/inactive
  * spans, the first step of any speech-data pipeline: silence
  * trimming, utterance extraction, speech-ratio quality gates).
  * Audio docs (doc_id % 3 == 1, the q55 role split) carry the usual
  * text-derived samples, round-trip through the real RIFF/WAV codec
  * ([[MediaCodec]] in the gated path), and are split into
  * [[FrameLen]]-sample frames whose energies (Σ|sample|, exact
  * integers) gate activity PARAMETER-FREE: a frame is active iff its
  * energy strictly exceeds the clip mean (`e·n_frames > Σe`,
  * cross-multiplied — no division, no float). Consecutive active
  * frames merge into segments (the q220 islands idea on a decoded
  * binary modality); the per-clip report pins every boundary via
  * `Σ ss·1000003 + se`.
  *
  * Scale shape: one `map` over audio rows — encode, decode, frame,
  * segment, all clip-local, no shuffle at all; the aggregate output
  * is one row per clip. The oracle re-derives the identical integer
  * energies from text in SQL (the q207 convention) and replays the
  * island merge with window functions. */
object AudioVad {

  /** Samples per analysis frame (a partial tail frame is dropped —
    * both engines define frames as FULL blocks only). */
  val FrameLen = 25

  /** Per-clip VAD profile: `(audio_id, n_frames, n_active,
    * n_segments, seg_checksum, active_permille)`. */
  def vadStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol) % 3 === 1)
      .as[(Long, String)]
      .map { case (id, text) =>
        val s = ImageDedup.sanitize(text)
        val n = math.min(s.length, Multimodal.WavMaxSamples)
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = ((s.charAt(i).toInt - 128) * 256).toShort
          i += 1
        }
        val (_, decoded) = MediaCodec.decodeWavPcm16(
          MediaCodec.encodeWavPcm16(Multimodal.WavRate, samples))
        val nf = n / FrameLen
        val e = Array.tabulate(nf) { f =>
          var acc = 0L
          var j = f * FrameLen
          while (j < (f + 1) * FrameLen) {
            acc += math.abs(decoded(j).toLong); j += 1
          }
          acc
        }
        val tot = e.sum
        val active = e.map(_ * nf > tot)
        var (ns, na, ck) = (0L, 0L, 0L)
        var f = 0
        while (f < nf) {
          if (active(f)) {
            val ss = f + 1
            while (f < nf && active(f)) { na += 1; f += 1 }
            ns += 1
            ck += ss.toLong * 1000003L + f // f is the 1-based segment end
          } else f += 1
        }
        (id, nf.toLong, na, ns, ck, if (nf > 0) 1000L * na / nf else 0L)
      }
      .toDF("audio_id", "n_frames", "n_active", "n_segments",
        "seg_checksum", "active_permille")
  }
}
