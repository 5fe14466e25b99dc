package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.MediaCodec

/** q323-q325 contracts: the Gonzalez greedy replays from collected
  * vectors with the exact Spark rounding semantics; the G.711
  * compander is idempotent, monotone, and container-round-trips; the
  * leakage matrix tiles q24's verified pair set. */
class CoresetAndMulawSpec extends SparkSpec {

  private def cosMicro(a: Array[Double], b: Array[Double]): Long = {
    var dot = 0d; var na = 0d; var nb = 0d; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    // Spark round(double) semantics: HALF_UP on BigDecimal.valueOf
    java.math.BigDecimal.valueOf(1e6 * c)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  test("q323: greedy k-center replays from collected vectors") {
    val out = graft.SparkEntry
      .queries("q323_kcenter_coreset")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = QueryUtil.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.similarity.CosineKnn.toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    var centers = Vector(PipelineQueries.KCenterSeed)
    var expect = Vector((1L, PipelineQueries.KCenterSeed, 1000000L))
    while (centers.length < PipelineQueries.KCenterK) {
      val cand = vecs.keys.filterNot(centers.contains).map { id =>
        val mind = centers.map(c => 1000000L - cosMicro(vecs(id), vecs(c))).min
        (id, mind)
      }
      val best = cand.minBy { case (id, d) => (-d, id) }
      centers :+= best._1
      expect :+= ((centers.length.toLong, best._1, best._2))
    }
    assert(out.toSeq == expect)
    // coverage radius is nonincreasing after the seed sentinel
    val d = out.map(_._3).drop(1)
    assert(d.toSeq == d.sorted.reverse.toSeq)
  }

  test("mu-law compander: idempotent on codewords, monotone, bounded error") {
    // idempotence: decode∘encode is identity on the decoded lattice
    (0 until 256).foreach { u =>
      val pcm = MediaCodec.muLawDecode(u.toByte)
      assert(MediaCodec.muLawDecode(MediaCodec.muLawEncode(pcm)) == pcm)
    }
    // monotone decode over the positive codes (u has inverted bits:
    // wire bytes 0x80..0xff are the positive half, descending mag)
    val pos = (0x80 to 0xff).map(u => MediaCodec.muLawDecode(u.toByte))
    assert(pos == pos.sorted.reverse)
    // quantization error ≤ half the top-segment step (128·2⁵ = 4096 is
    // generous; G.711's true bound inside the clip region)
    var s = -32768
    while (s <= 32767) {
      val rt = MediaCodec.muLawDecode(MediaCodec.muLawEncode(s.toShort)).toInt
      val clipped = math.max(-32635, math.min(32635, s))
      assert(math.abs(rt - clipped) <= 4096, s"pcm $s -> $rt")
      s += 17
    }
  }

  test("mu-law WAV: container round-trips; chunk walk handles fact; rejects PCM") {
    val samples = Array.tabulate(100)(i => ((i * 37) % 256 - 128).toByte)
    val wav = MediaCodec.encodeWavMuLaw(8000, samples)
    assert(wav.length == 58 + samples.length)
    val (rate, pcm) = MediaCodec.decodeWavMuLaw(wav)
    assert(rate == 8000 && pcm.length == samples.length)
    assert(pcm.toSeq == samples.map(MediaCodec.muLawDecode).toSeq)
    val pcmWav = MediaCodec.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](MediaCodec.decodeWavMuLaw(pcmWav))
  }

  test("q325: leakage matrix tiles q24's verified pair set") {
    val pairs = graft.SparkEntry
      .queries("q24_embedding_neardup")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = md5hex(s"$id:split").substring(0, 4)
      if (b < f"${CurationQueries.SplitTrainThr}%04x") "train"
      else if (b < f"${CurationQueries.SplitValThr}%04x") "val"
      else "test"
    }
    val want = pairs.groupBy(p => (splitOf(p._1), splitOf(p._2)))
      .map { case ((a, b), ps) => (a, b, ps.length.toLong, a != b) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry
      .queries("q325_semantic_leakage")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == want)
    assert(got.map(_._3).sum == pairs.length.toLong)
  }
}
