package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.{ExtendedQueries, QueryUtil}

class FormatRoundtripSpec extends SparkSpec {

  test("q138: every format lands on the parquet fingerprint; the payload is CSV-hostile") {
    val rows = ExtendedQueries.formatRoundtrip(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("1_parquet", "2_orc", "3_csv"))
    // all three fingerprints identical — the round trips are lossless
    assert(rows.map(r => (r._2, r._3, r._4, r._5)).distinct.length == 1)
    val docs = QueryUtil.table(spark, sfDir, "documents")
    assert(rows.head._2 == docs.count())
    assert(rows.head._3 ==
      docs.agg(sum("doc_id")).head.getLong(0))
    // the fixture genuinely exercises quoting: separator, quote, newline
    assert(ExtendedQueries.FmtDirtySuffix.contains(",") &&
      ExtendedQueries.FmtDirtySuffix.contains("\"") &&
      ExtendedQueries.FmtDirtySuffix.contains("\n"))
    // checksum is content-sensitive: recompute driver-side and perturb
    val dirty = docs.select(col("doc_id"),
        concat(col("text"), lit(ExtendedQueries.FmtDirtySuffix),
          col("doc_id").cast("string")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def x31(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val expect = dirty.map { case (id, t) => x31(s"$t:$id") }.sum
    assert(rows.head._5 == expect)
    val perturbed = dirty.map { case (id, t) =>
      if (id == dirty.head._1) x31(s"${t}x:$id") else x31(s"$t:$id")
    }.sum
    assert(perturbed != expect, "checksum blind to a one-char edit")
  }
}
