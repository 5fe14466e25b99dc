package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.expr

/** Error-bound contract for the bounded-memory quantile scale path
  * (q35) and a smoke gate for the streaming top-K query (q34). */
class QuantileSpec extends SparkSpec {

  test("q35 approx quartiles land within the Greenwald-Khanna rank bound") {
    val vals = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val q = AnalyticsQueries.approxQuartiles(spark, sfDir).head()
    val eps = 1.0 / AnalyticsQueries.ApproxPercentileAccuracy
    for ((name, p) <- Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75)) {
      val v = q.getAs[Double](name)
      // approx_percentile returns an actual data value; its rank must
      // be within eps*n (+1 for the floor/interpolation seam) of target
      val rank = vals.count(_ <= v)
      assert(math.abs(rank - p * n) <= eps * n + 1,
        s"$name=$v has rank $rank, target ${p * n} (n=$n)")
    }
    // with eps*n < 1 at this SF the fences are effectively exact, so
    // the Tukey outlier count from the approx quartiles must match the
    // exact query's
    val (q1, q3) = (q.getAs[Double]("q1"), q.getAs[Double]("q3"))
    val iqr = q3 - q1
    val outliers = vals.count(v => v < q1 - 1.5 * iqr || v > q3 + 1.5 * iqr)
    val exact = AnalyticsQueries.quartilesOutliers(spark, sfDir).head()
    assert(outliers.toLong == exact.getAs[Long]("n_outliers"))
    // the gate output itself: row count + all rank claims true
    val row = AnalyticsQueries.quartilesOutliersApprox(spark, sfDir).head()
    assert(row.getAs[Long]("n") == n.toLong)
    for (c <- Seq("q1_ok", "q2_ok", "q3_ok"))
      assert(row.getAs[Boolean](c), s"$c false")
  }

  test("epoch bucketing floors (DuckDB // parity), including pre-1970") {
    val s = spark
    import s.implicits._
    // -1 ns is 1969-12-31T23:59:59.999…; floor semantics put it in the
    // PREVIOUS hour/day bucket — `div` (truncate toward zero) puts it
    // in bucket 0, which is what date_trunc/'//' would NOT do.
    val df = Seq(-1L, -3600000000000L, -3600000000001L, 0L, 1L, 7200000000000L)
      .toDF("ts")
    val got = df.select(
        expr("(ts - pmod(ts, 3600000000000)) div 3600000000000").as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq(-1L, -3600000000000L, -3600000000001L, 0L, 1L, 7200000000000L)
      .map(Math.floorDiv(_, 3600000000000L))
    assert(got == want, s"got $got want $want")
  }

  test("q34 streaming top-k emits ranked rows per event_type") {
    val df = PipelineQueries.streamTopK(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("key")).distinct
    val nTypes = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type").distinct().count()
    assert(types.length == nTypes, s"every event_type keyed: $types")
    assert(rows.map(_.getAs[Int]("rank")).forall(r => r >= 1 && r <= 5))
  }

  // ---- q233: V-optimal histogram DP -----------------------------------

  test("q233 DP is exhaustively optimal on a small instance") {
    val cnts = Array[Long](5, 1, 1, 9, 2, 0, 7, 3, 3, 8)
    val k = 3
    def cost(lo: Int, hi: Int): Long = {
      val xs = (lo until hi).flatMap(i => Seq.fill(cnts(i).toInt)(i.toLong))
      if (xs.isEmpty) 0L
      else xs.size.toLong * xs.map(x => x * x).sum - {
        val s = xs.sum; s * s
      }
    }
    // every way to split 10 cells into 3 non-empty runs
    val all = for {
      a <- 1 to 8; b <- (a + 1) to 9
    } yield (Seq((0, a), (a, b), (b, 10)),
      cost(0, a) + cost(a, b) + cost(b, 10))
    val best = all.map(_._2).min
    val dp = AnalyticsQueries.voptDp(cnts, k)
    assert(dp.map(_._4).sum == best, s"DP ${dp.map(_._4).sum} vs $best")
    // the DP picks the smallest-split optimum among ties
    val optimal = all.filter(_._2 == best).map(_._1)
    val dpBounds = dp.map(s => (s._1, s._2))
    assert(optimal.map(_.map(t => (t._1, t._2))).contains(dpBounds.toSeq))
    assert(dpBounds == optimal.map(_.map(t => (t._1, t._2)))
      .minBy(_.map(_._1).mkString(",")))
  }

  test("q233 output partitions the grid; beats the equi-width baseline") {
    val rows = AnalyticsQueries.voptimalHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == AnalyticsQueries.VoptBuckets)
    // contiguous cover of [0, 63]
    assert(rows.head._2 == 0L &&
      rows.last._3 == AnalyticsQueries.VoptCells - 1L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._3 + 1, s"gap between buckets ${a._1} and ${b._1}")
    case _ => }
    // conservation
    val n = QueryUtil.table(spark, sfDir, "orders").count()
    assert(rows.map(_._4).sum == n)
    // optimality vs the equi-width 8-bucket baseline on the same grid
    val cents = QueryUtil.table(spark, sfDir, "orders")
      .selectExpr("cast(floor(o_totalprice * 100) as long) as c")
      .collect().map(_.getLong(0))
    val (lo, hi) = (cents.min, cents.max)
    val cell = cents.map(c => ((c - lo) * AnalyticsQueries.VoptCells /
      (hi - lo + 1)).toInt)
    val cnts = new Array[Long](AnalyticsQueries.VoptCells)
    cell.foreach(i => cnts(i) += 1)
    def rangeCost(l: Int, h: Int): Long = {
      val w = (l until h).map(cnts).sum
      val s = (l until h).map(i => cnts(i) * i).sum
      val ss = (l until h).map(i => cnts(i) * i.toLong * i).sum
      w * ss - s * s
    }
    val equi = (0 until 8).map(t => rangeCost(t * 8, (t + 1) * 8)).sum
    assert(rows.map(_._5).sum <= equi,
      s"v-optimal ${rows.map(_._5).sum} worse than equi-width $equi")
  }
}
