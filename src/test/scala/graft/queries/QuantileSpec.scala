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
}
