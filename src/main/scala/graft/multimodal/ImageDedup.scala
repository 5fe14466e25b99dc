package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image dedup: difference-hash (dHash) near-duplicate
  * detection over REALLY-decoded images — the visual counterpart of
  * the text MinHash/SimHash family (q10/q11) and the classic first
  * pass of an image-corpus pipeline (catches re-encodes, minor edits,
  * watermark stamps that byte-level dedup misses).
  *
  * Pipeline: image docs (the q55 convention — doc_id % 3 == 0 carries
  * a 24-bit BMP whose gray pixels are the doc's sanitized text bytes,
  * ref. jar/ProfileJob.java has no media path; this is extension
  * surface) are ENCODED with the hand-rolled BMP codec, DECODED back
  * ([[MediaCodec.decodeBmp]] — the hash is computed from decoded
  * pixels, so the codec is in the gated path), grid-sampled to 8×9,
  * and hashed: bit (r,c) = sample(r,c) > sample(r,c+1) — 64 gradient
  * bits, the standard dHash. A perturbed TWIN of every image (every
  * [[Stride]]-th live pixel forced to 126) models the re-encode /
  * small-edit duplicate; twins flip at most 2 gradient bits per
  * perturbed pixel, so twin distance ≤ 6 < [[Tau]].
  *
  * Detection is banded exactly like SimHash: 8 disjoint 8-bit bands;
  * a pair within Hamming [[Tau]] = 7 differs in at most 7 bands, so
  * BY PIGEONHOLE it collides on at least one — candidates come from
  * band-bucket equi-joins (never an all-pairs scan), verification is
  * one codegen `bit_count(a ^ b)`. The DuckDB oracle recomputes the
  * IDENTICAL hashes from text and brute-forces all pairs, so the
  * banded result is provably exhaustive, incidental (non-twin)
  * collisions included.
  *
  * Scale shape: hashing is one pass over image docs (64 bits per
  * image retained — 100 TB of images become GBs of hashes);
  * candidates ∝ band collisions; the verify is projection-only. The
  * sampled geometry (first [[Multimodal.BmpMaxBytes]] pixels) is the
  * thumbnail convention: perceptual hashes are computed on a
  * fixed-size downsample regardless of source resolution.
  */
object ImageDedup {

  /** Every Stride-th live pixel (1-based) is forced to 126 in the
    * twin — 3 pixels at the 240-byte cap, ≤ 6 flipped bits. */
  val Stride = 67
  /** Near-dup threshold: pairs within Hamming ≤ Tau are duplicates.
    * MUST stay < [[Bands]] for the pigeonhole guarantee. */
  val Tau = 7
  /** Disjoint 8-bit bands over the 64-bit hash. */
  val Bands = 8
  /** Twin ids live at base id + this offset — far above any shipped
    * corpus id space. */
  val TwinOffset = 1000000000L

  /** Printable-ASCII sanitization both engines agree on: drop every
    * codepoint outside [' ', '~'] (multi-unit codepoints drop whole in
    * both Java and RE2 semantics). */
  def sanitize(text: String): String = text.replaceAll("[^ -~]", "")

  /** Grid sample (r ∈ 0..7, c ∈ 0..8) of a width-16 × h gray image:
    * integer-floor row/col mapping, so both engines index the same
    * pixel. */
  private def samp(gray: Array[Byte], h: Int, r: Int, c: Int): Int = {
    val rowPx = r * h / 8
    val colPx = c * Multimodal.BmpWidth / 9
    gray(rowPx * Multimodal.BmpWidth + colPx) & 0xff
  }

  /** `(img_id, dhash)` for every image doc AND its perturbed twin —
    * the hash computed from pixels that went THROUGH the BMP codec
    * (encode → decode), not from the text shortcut. */
  def imageHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol) % 3 === 0)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val s = sanitize(text)
        Seq((id, false), (id + TwinOffset, true)).map { case (hid, twin) =>
          val len = math.min(s.length, Multimodal.BmpMaxBytes)
          val h = math.max(1, (len + Multimodal.BmpWidth - 1) / Multimodal.BmpWidth)
          val gray = new Array[Byte](Multimodal.BmpWidth * h)
          var i = 0
          while (i < len) {
            val c = if (twin && (i + 1) % Stride == 0) 126 else s.charAt(i).toInt
            gray(i) = c.toByte
            i += 1
          }
          val (_, dh, decoded) =
            MediaCodec.decodeBmp(MediaCodec.encodeBmp(Multimodal.BmpWidth, h, gray))
          var hash = 0L
          var r = 0
          while (r < 8) {
            var cc = 0
            while (cc < 8) {
              if (samp(decoded, dh, r, cc) > samp(decoded, dh, r, cc + 1))
                hash |= 1L << (r * 8 + cc)
              cc += 1
            }
            r += 1
          }
          (hid, hash)
        }
      }.toDF("img_id", "dhash")
  }

  /** Banded near-dup pairs: `(id_a, id_b, hamming, twin_pair)` for
    * every pair within Hamming ≤ [[Tau]] — provably ALL of them (the
    * pigeonhole property above; the oracle brute-forces the same
    * set). */
  def nearDupPairs(hashes: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), 8 * b).bitwiseAND(lit(0xffL)).as("bv"))
    }
    val banded = hashes
      .select(col("img_id"), col("dhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("img_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("id_a"), col("b.img_id").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
    cands
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= Tau)
      .withColumn("twin_pair", col("id_b") - col("id_a") === TwinOffset)
      .orderBy("id_a", "id_b")
  }
}
