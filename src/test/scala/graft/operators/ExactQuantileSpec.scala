package graft.operators

import graft.SparkSpec

import scala.util.Random

/** The bounded-memory exact quantile (q65's operator): exactness vs a
  * driver-side sort, and the memory-bound CLAIM itself — refinement
  * must never collect more than `collectMax` values even when forced
  * through multiple passes by a tiny budget. */
class ExactQuantileSpec extends SparkSpec {

  /** Reference: interpolated quantile over a sorted array
    * (percentile / quantile_cont semantics). */
  private def refQuantile(sorted: Array[Double], p: Double): Double = {
    val h = 1.0 + p * (sorted.length - 1)
    val (lo, hi) = (math.floor(h).toInt, math.ceil(h).toInt)
    sorted(lo - 1) + (h - lo) * (sorted(hi - 1) - sorted(lo - 1))
  }

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  test("matches driver-side sort on random data, duplicates, and skew") {
    val s = spark
    import s.implicits._
    val rnd = new Random(41)
    val datasets = Seq(
      Array.fill(5000)(rnd.nextDouble() * 1000 - 500),          // uniform
      Array.fill(5000)((rnd.nextInt(20) * 7).toDouble),         // heavy dups
      Array.fill(5000)(math.exp(rnd.nextGaussian() * 3)),       // skewed
      Array(42.0),                                              // singleton
      Array.fill(3000)(13.25))                                  // constant
    for ((data, i) <- datasets.zipWithIndex) {
      val df = data.toSeq.toDF("x")
      val got = ExactQuantile.quantiles(df, "x", ps, buckets = 64)
      val sorted = data.sorted
      ps.zip(got).foreach { case (p, g) =>
        val want = refQuantile(sorted, p)
        assert(math.abs(g - want) <= math.abs(want) * 1e-12 + 1e-12,
          s"dataset $i p=$p: got $g want $want")
      }
    }
  }

  test("per-pass memory stays under collectMax even with a tiny budget") {
    val s = spark
    import s.implicits._
    val rnd = new Random(43)
    val data = Array.fill(20000)(rnd.nextDouble() * 1e6)
    val df = data.toSeq.toDF("x")
    // 8 buckets + collectMax 64 forces log_8(20000/64) ≈ 3 refinement
    // passes; the claim: never more than collectMax values collected
    val (got, stats) = ExactQuantile.quantilesWithStats(
      df, "x", Seq(0.25, 0.5, 0.75), buckets = 8, collectMax = 64)
    assert(stats.maxCollected <= 64,
      s"collected ${stats.maxCollected} > collectMax")
    assert(stats.scans <= 8, s"took ${stats.scans} scans")
    val sorted = data.sorted
    Seq(0.25, 0.5, 0.75).zip(got).foreach { case (p, g) =>
      assert(math.abs(g - refQuantile(sorted, p)) <= 1e-6, s"p=$p")
    }
  }

  test("ulp-narrow duplicate flood resolves via the distinct-value fallback") {
    // all mass inside a one-ulp range with count >> collectMax:
    // equal-width refinement cannot split it (width underflows to 0),
    // so the stall guard must resolve through the bounded
    // distinct-value histogram instead of looping or collecting 6000
    val s = spark
    import s.implicits._
    val a = 12345.6789
    val b = math.nextUp(a)
    val data = Array.fill(3000)(a) ++ Array.fill(3000)(b)
    val df = scala.util.Random.shuffle(data.toSeq).toDF("x")
    val (got, stats) = ExactQuantile.quantilesWithStats(
      df, "x", Seq(0.25, 0.5, 0.75), buckets = 8, collectMax = 100)
    val sorted = data.sorted
    Seq(0.25, 0.5, 0.75).zip(got).foreach { case (p, g) =>
      assert(g == refQuantile(sorted, p), s"p=$p")
    }
    assert(stats.maxCollected <= 100, s"collected ${stats.maxCollected}")
  }

  test("config fuzz: exact across bucket counts, budgets, and distributions") {
    val s = spark
    import s.implicits._
    val rnd = new Random(53)
    val dists: Seq[Array[Double]] = Seq(
      Array.fill(4000)(rnd.nextDouble()),                      // uniform
      Array.fill(4000)((rnd.nextInt(5) * 1000).toDouble),      // 5 values
      Array.fill(4000)(rnd.nextGaussian() * 1e-8),             // tiny scale
      Array.tabulate(4000)(i => i.toDouble) ++ Array(1e12)     // outlier
    )
    val configs = Seq((4, 16), (8, 64), (32, 32), (256, 8), (13, 100))
    for ((data, di) <- dists.zipWithIndex) {
      val df = data.toSeq.toDF("x")
      val sorted = data.sorted
      for (((b, cm), ci) <- configs.zipWithIndex) {
        val (got, stats) = ExactQuantile.quantilesWithStats(
          df, "x", Seq(0.1, 0.5, 0.9), buckets = b, collectMax = cm)
        assert(stats.maxCollected <= cm, s"dist $di cfg $ci: ${stats.maxCollected}")
        Seq(0.1, 0.5, 0.9).zip(got).foreach { case (p, g) =>
          val want = refQuantile(sorted, p)
          assert(math.abs(g - want) <= math.abs(want) * 1e-12 + 1e-300,
            s"dist $di cfg ($b,$cm) p=$p: got $g want $want")
        }
      }
    }
  }

  test("empty and all-null inputs yield NaN") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[Double].toDF("x")
    assert(ExactQuantile.quantiles(empty, "x", Seq(0.5)).forall(_.isNaN))
    val nulls = Seq[Option[Double]](None, None).toDF("x")
    assert(ExactQuantile.quantiles(nulls, "x", Seq(0.5)).forall(_.isNaN))
  }

  test("grouped quantiles match per-group driver-side sorts, memory-bounded") {
    val s = spark
    import s.implicits._
    val rnd = new Random(47)
    val data = Seq.tabulate(12000) { i =>
      val g = s"g${i % 7}"
      (g, rnd.nextDouble() * (1 + i % 7) * 100)
    }
    val df = data.toDF("g", "x")
    val (got, stats) = ExactQuantile.groupedQuantilesWithStats(
      df, "g", "x", Seq(0.25, 0.5, 0.75), buckets = 16, collectMax = 128)
    assert(stats.maxCollected <= 128)
    val byGroup = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toArray.sorted }
    assert(got.keySet == byGroup.keySet.map(identity[Any]))
    byGroup.foreach { case (g, sorted) =>
      Seq(0.25, 0.5, 0.75).zip(got(g)).foreach { case (p, v) =>
        val want = refQuantile(sorted, p)
        assert(math.abs(v - want) <= math.abs(want) * 1e-12 + 1e-12, s"$g p=$p")
      }
    }
  }

  test("q69 equals q50 (buffer-exact grouped) on the bench corpus") {
    val a = graft.queries.ScaleQueries.groupQuantiles(spark, sfDir).collect()
    val b = graft.queries.ScaleQueries.groupQuantilesScalable(spark, sfDir).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getAs[Long]("n_orders") == y.getAs[Long]("n_orders"))
      for (c <- Seq("q1", "q2", "q3"))
        assert(x.getAs[Double](c) == y.getAs[Double](c), s"${x.getString(0)} $c")
    }
  }

  test("q65 equals q20 (buffer-exact) on the bench corpus") {
    val a = graft.queries.AnalyticsQueries.quartilesOutliers(spark, sfDir).head()
    val b = graft.queries.AnalyticsQueries.quartilesOutliersScalable(spark, sfDir).head()
    for (c <- Seq("q1", "q2", "q3"))
      assert(a.getAs[Double](c) == b.getAs[Double](c), c)
    assert(a.getAs[Long]("n_outliers") == b.getAs[Long]("n_outliers"))
  }
}
