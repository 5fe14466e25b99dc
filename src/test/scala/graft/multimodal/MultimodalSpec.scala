package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("media schema keeps binary content + flat typed metadata") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val sch = media.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("media_type").dataType.typeName == "string")
    assert(sch("width").dataType.typeName == "integer")
    // metadata-only predicate must not require reading bytes (pushdown-able)
    assert(media.filter(col("media_type") === "image").count() > 0)
  }

  test("feature extraction: deterministic stub features check out") {
    val media = Multimodal.syntheticMedia(docs.limit(10), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
    val texts = docs.limit(10).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.length == 10)
    feats.foreach { f =>
      val bytes = texts(f.media_id).getBytes("UTF-8")
      assert(f.n_bytes == bytes.length.toLong)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(f.checksum == md5)
      val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      assert(math.abs(f.mean_byte - mean) < 1e-5)
      assert(f.n_sampled_frames >= 1)
    }
  }

  test("resize stub: aspect-preserving metadata transform") {
    val media = Multimodal.syntheticMedia(docs.limit(50), "doc_id", "text")
    Multimodal.resize(media, 32).collect().foreach { r =>
      val ow = r.getAs[Int]("out_width"); val oh = r.getAs[Int]("out_height")
      assert(ow <= 32 + 1 && oh <= 32 + 1)
      assert(ow <= r.getAs[Int]("width") && oh <= r.getAs[Int]("height"))
    }
  }
}
