package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q326/q327 contracts: the KMV estimate replays from first
  * principles; the streaming semi join emits exactly the distinct
  * matched-left rows of the outer join, once each. */
class KmvAndSemiJoinSpec extends SparkSpec {

  test("q326: KMV replays from first principles; exact under k; estimate deterministic") {
    val out = graft.SparkEntry
      .queries("q326_kmv_distinct")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byType = QueryUtil.table(spark, sfDir, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val want = byType.map { case (t, us) =>
      val hs = us.map(u =>
        java.lang.Long.parseLong(md5hex(u._2 + ":kmv").substring(0, 8), 16))
        .distinct.sorted
      val nd = us.map(_._2).distinct.length.toLong
      val (est, exact) =
        if (hs.length >= AnalyticsQueries.KmvK)
          (((AnalyticsQueries.KmvK - 1).toLong * 4294967296L)
            / hs(AnalyticsQueries.KmvK - 1), false)
        else (nd, true)
      (t, nd, est, exact, 1000L * math.abs(est - nd) / nd)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == want)
    // estimating regime (active at gate SF, not at this one): the same
    // formula over a synthetic 500-key population lands within the
    // sketch's expected error envelope (~1/sqrt(k) ≈ 12.5%; 3σ bound)
    val hs = (1 to 500).map(u =>
      java.lang.Long.parseLong(md5hex(u + ":kmv").substring(0, 8), 16))
      .distinct.sorted
    assert(hs.length >= AnalyticsQueries.KmvK)
    val est = ((AnalyticsQueries.KmvK - 1).toLong * 4294967296L) /
      hs(AnalyticsQueries.KmvK - 1)
    assert(math.abs(est - 500L) <= 190L, s"synthetic est $est")
  }

  test("q327: semi join == distinct matched-left of the outer join, emitted once") {
    val semi = graft.SparkEntry
      .queries("q327_stream_semi_join")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val outer = graft.SparkEntry
      .queries("q267_stream_outer_join")(spark, sfDir)
      .filter(col("click_ts_us").isNotNull)
      .select("user_id", "purchase_ts_us", "event_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(semi.toSeq.sorted == outer.toSeq.sorted)
    // once each: no duplicate emission survives
    assert(semi.distinct.length == semi.length)
  }
}
