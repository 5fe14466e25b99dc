package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Driver replays for q304/q305/q306. */
class FrontierAndShiftSpec extends SparkSpec {

  test("detector agreement: Venn arithmetic is consistent") {
    val r = graft.SparkEntry
      .queries("q304_detector_agreement")(spark, sfDir).collect().head
    val (mh, sh, both) = (r.getAs[Long]("minhash_pairs"),
      r.getAs[Long]("simhash_pairs"), r.getAs[Long]("n_both"))
    assert(both <= math.min(mh, sh))
    assert(r.getAs[Long]("only_minhash") == mh - both)
    assert(r.getAs[Long]("only_simhash") == sh - both)
    val union = mh + sh - both
    assert(r.getAs[Long]("agreement_pm") ==
      1000L * both / math.max(union, 1L))
    assert(mh > 0 && sh > 0, "both detectors fire on the test corpus")
  }

  test("pareto frontier: no member dominated, no non-member undominated") {
    val frontier = graft.SparkEntry
      .queries("q305_pareto_frontier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        round(graft.text.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = all.exists(y =>
      y._2 >= x._2 && y._3 >= x._3 && (y._2 > x._2 || y._3 > x._3))
    val want = all.filter(!dominated(_)).sortBy(_._1).toSeq
    assert(frontier.sortBy(_._1).toSeq == want)
    assert(frontier.nonEmpty && frontier.length < all.length)
  }

  test("Wasserstein-1: exact quantile-area replay per source pair") {
    val rows = graft.SparkEntry
      .queries("q306_wasserstein_shift")(spark, sfDir).collect()
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byS = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (xs, ys) = (byS(a), byS(b))
      val vs = (xs ++ ys).distinct.sorted
      var area = 0L
      vs.zip(vs.tail).foreach { case (v, nxt) =>
        val fa = xs.count(_ <= v).toLong
        val fb = ys.count(_ <= v).toLong
        area += math.abs(fa * ys.length - fb * xs.length) * (nxt - v)
      }
      assert(r.getAs[Long]("w1_milli_chars") ==
        1000L * area / (xs.length.toLong * ys.length), s"($a,$b)")
    }
    assert(rows.length >= 10)
  }
}
