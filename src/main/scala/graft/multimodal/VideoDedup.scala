package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual VIDEO near-duplicate detection — the fourth and last
  * modality of the dedup family (text q10, image q206, audio q207):
  * a video's signature is the SEQUENCE of per-frame dHashes, computed
  * from frames that went THROUGH the real RIFF/AVI container
  * ([[MediaCodec.encodeAviMjpeg]]/[[MediaCodec.decodeAviMjpeg]] — the
  * chunk layer is codec-agnostic and byte-exact, here carrying
  * uncompressed gray frames, the VFW raw-DIB convention; JPEG inside
  * the same container is q186's path. Losslessness is what lets the
  * oracle recompute the identical bits from source bytes — the
  * q206/q207 exactness discipline).
  *
  * Duplicate model: a perturbed twin per video (every
  * [[VideoDedup.Stride]]-th byte forced to 126 — the re-encode /
  * small-edit duplicate), with the Hamming budget SCALED to length:
  * `hamming ≤ 2·nf + 1` over the nf·64 signature bits. Banding is
  * q206's per-frame construction: 8 disjoint 8-bit bands per frame →
  * `(frame, band, value)` equi-join buckets, and `2·nf + 1 < 8·nf`
  * bands means Hamming within budget forces a band collision
  * (pigeonhole) — the banded candidate set is provably exhaustive,
  * which the brute-force oracle checks literally. Frame-count
  * equality is part of the video-identity contract (different length
  * ⇒ different video; candidates join on `nf` too).
  *
  * 100 TB shape: videos → nf·8-byte hash rows (GBs for billions of
  * clips); candidates ∝ band collisions, never all-pairs; verify is
  * one `bit_count(xor)` sum per candidate over ≤ [[Multimodal.AviMaxFrames]]
  * joined frame rows. */
object VideoDedup {

  /** Twin perturbation stride over the (1-based) video byte stream:
    * multiples of 63 land on sampled grid cells in rows the dHash
    * reads, flipping ≤ 2·nf + 1 bits for an nf-frame clip — inside
    * the scaled budget by construction (VideoDedupSpec measures it). */
  val Stride = 63

  /** Per-pair Hamming budget for an nf-frame pair: `2·nf + 1` —
    * strictly under the 8·nf bands, so pigeonhole exhaustiveness
    * holds at every length. */
  def tau(nfCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nfCol * 2L + 1L

  val TwinOffset: Long = ImageDedup.TwinOffset
  val Bands = 8

  /** One row per (video, frame): `(vid_id, nf, frame, dhash)` for
    * every video doc (doc_id % 3 == 1) AND its perturbed twin. The
    * frames round-trip the AVI container before hashing; a container
    * fault fails loudly rather than hashing the wrong pixels. */
  def videoHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    import Multimodal.{AviFrameBytes, AviFrameH, AviFrameW, AviFps, AviMaxFrames}
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(idCol) % 3 === 1)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val s = ImageDedup.sanitize(text)
        Seq((id, false), (id + TwinOffset, true)).flatMap { case (hid, twin) =>
          val len = math.min(s.length, AviFrameBytes * AviMaxFrames)
          val nf = math.max(1, (len + AviFrameBytes - 1) / AviFrameBytes)
          val frames = (0 until nf).map { f =>
            val px = new Array[Byte](AviFrameBytes)
            var o = 0
            while (o < AviFrameBytes && f * AviFrameBytes + o < len) {
              val i = f * AviFrameBytes + o
              val c = if (twin && (i + 1) % Stride == 0) 126 else s.charAt(i).toInt
              px(o) = c.toByte
              o += 1
            }
            px
          }
          val avi = MediaCodec.encodeAviMjpeg(AviFrameW, AviFrameH, AviFps, frames)
          val (dw, dh, dfps, dec) = MediaCodec.decodeAviMjpeg(avi)
          require(dw == AviFrameW && dh == AviFrameH && dfps == AviFps &&
            dec.length == nf &&
            frames.zip(dec).forall { case (a, b) => java.util.Arrays.equals(a, b) },
            s"AVI round trip corrupted video $hid")
          dec.zipWithIndex.map { case (px, f) =>
            var hash = 0L
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                def samp(cc: Int): Int =
                  px(r * AviFrameW + cc * AviFrameW / 9) & 0xff
                if (samp(c) > samp(c + 1)) hash |= 1L << (r * 8 + c)
                c += 1
              }
              r += 1
            }
            (hid, nf.toLong, f.toLong, hash)
          }
        }
      }.toDF("vid_id", "nf", "frame", "dhash")
  }

  /** Banded near-dup pairs `(id_a, id_b, n_frames, hamming,
    * twin_pair)`: candidates from `(frame, band, value)` buckets with
    * equal frame counts, verified by the exact signature Hamming
    * against the scaled budget — provably all pairs within it. */
  def nearDupPairs(hashes: DataFrame): DataFrame = {
    // the signature table feeds FOUR scans (two banded sides + both
    // verify joins); persist it or the codec flatMap runs four times —
    // scratch is released by the caller's cache clear (the
    // graft.CachedResult trade, documented there)
    val h = hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), 8 * b).bitwiseAND(lit(0xffL)).as("bv"))
    }
    val banded = h
      .select(col("vid_id"), col("nf"), col("frame"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("vid_id"), col("nf"), col("frame"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.frame") === col("b.frame") && col("a.band") === col("b.band") &&
          col("a.bv") === col("b.bv") && col("a.nf") === col("b.nf") &&
          col("a.vid_id") < col("b.vid_id"))
      .select(col("a.vid_id").as("id_a"), col("b.vid_id").as("id_b"))
      .distinct()
    val ha = h.toDF("id_a", "nf", "frame", "h_a")
    val hb = h.toDF("id_b", "nf_b", "frame", "h_b")
    cands.join(ha, "id_a")
      .join(hb, Seq("id_b", "frame"))
      .groupBy("id_a", "id_b")
      .agg(max(col("nf")).as("n_frames"),
        sum(expr("bit_count(h_a ^ h_b)")).cast("long").as("hamming"))
      .filter(col("hamming") <= tau(col("n_frames")))
      .withColumn("twin_pair", col("id_b") - col("id_a") === TwinOffset)
      .select("id_a", "id_b", "n_frames", "hamming", "twin_pair")
      .orderBy("id_a", "id_b")
  }
}
