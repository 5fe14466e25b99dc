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

  test("10^4 distinct groups resolve in the same scan count as 5 groups") {
    // the broadcast-joined range table: scan count is a function of
    // group SIZE vs collectMax, never of group COUNT — a literal
    // predicate chain would grow the expression tree per group and
    // choke the planner around a few thousand
    val s = spark
    import s.implicits._
    val rnd = new Random(59)
    val big = Seq.tabulate(80000) { i => (s"d${i % 10000}", rnd.nextDouble() * 100) }
      .toDF("g", "x")
    val small = Seq.tabulate(40) { i => (s"d${i % 5}", rnd.nextDouble() * 100) }
      .toDF("g", "x")
    val ps3 = Seq(0.25, 0.5, 0.75)
    val (gotBig, statsBig) = ExactQuantile.groupedQuantilesWithStats(
      big, "g", "x", ps3, buckets = 16, collectMax = 128)
    val (_, statsSmall) = ExactQuantile.groupedQuantilesWithStats(
      small, "g", "x", ps3, buckets = 16, collectMax = 128)
    assert(gotBig.size == 10000)
    assert(statsBig.scans == statsSmall.scans,
      s"scan count grew with group count: ${statsBig.scans} vs ${statsSmall.scans}")
    assert(statsBig.maxCollected <= 128)
    // spot-check correctness on a handful of groups vs driver sort
    val byGroup = big.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (g <- Seq("d0", "d1234", "d9999"); (p, v) <- ps3.zip(gotBig(g))) {
      val want = refQuantile(byGroup(g), p)
      assert(math.abs(v - want) <= math.abs(want) * 1e-12 + 1e-12, s"$g p=$p")
    }
  }

  test("NaN orders last, matching Spark percentile (pinned behavior)") {
    // a 100 TB numeric column will contain NaNs; the operator's
    // contract: NaN is the LARGEST value (Spark sort order, DuckDB
    // quantile_cont order) — low ranks stay finite and exact, ranks
    // landing in or interpolating into the NaN tail return NaN
    val s = spark
    import s.implicits._
    val rnd = new Random(61)
    val finite = Array.fill(900)(rnd.nextDouble() * 100)
    val data = finite ++ Array.fill(100)(Double.NaN)
    val df = scala.util.Random.shuffle(data.toSeq).toDF("x")
    val ps5 = Seq(0.0, 0.5, 0.85, 0.95, 1.0)
    val got = ExactQuantile.quantiles(df, "x", ps5, buckets = 16)
    // reference: java sort puts NaN last; refQuantile then interpolates
    val sorted = data.sorted
    ps5.zip(got).foreach { case (p, g) =>
      val want = refQuantile(sorted, p)
      if (want.isNaN) assert(g.isNaN, s"p=$p: got $g want NaN")
      else assert(math.abs(g - want) <= math.abs(want) * 1e-12 + 1e-12,
        s"p=$p: got $g want $want")
    }
    // and the engine cross-check: Spark's own percentile agrees
    val sparkPct = df.agg(
      org.apache.spark.sql.functions.expr(
        s"percentile(x, array(${ps5.mkString(",")}))")).head()
      .getSeq[Double](0)
    ps5.indices.foreach { i =>
      val (a, b) = (got(i), sparkPct(i))
      assert((a.isNaN && b.isNaN) || math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12,
        s"p=${ps5(i)}: ExactQuantile $a vs percentile $b")
    }
  }

  test("q69/q50 equal the one-scan grouped percentile cross-check on the bench corpus") {
    val a = graft.queries.ScaleQueries.groupQuantilesOneScan(spark, sfDir).collect()
    val b = graft.queries.ScaleQueries.groupQuantilesScalable(spark, sfDir).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getAs[Long]("n_orders") == y.getAs[Long]("n_orders"))
      for (c <- Seq("q1", "q2", "q3"))
        assert(x.getAs[Double](c) == y.getAs[Double](c), s"${x.getString(0)} $c")
    }
  }

  test("q65/q20 equal the one-scan percentile cross-check on the bench corpus") {
    val a = graft.queries.AnalyticsQueries.quartilesOutliersOneScan(spark, sfDir).head()
    val b = graft.queries.AnalyticsQueries.quartilesOutliersScalable(spark, sfDir).head()
    for (c <- Seq("q1", "q2", "q3"))
      assert(a.getAs[Double](c) == b.getAs[Double](c), c)
    assert(a.getAs[Long]("n_outliers") == b.getAs[Long]("n_outliers"))
  }

  test("q78 equi-depth property: bucket counts within 1 of n/K on distinct data") {
    val s = spark
    import s.implicits._
    // distinct values, shuffled deterministically — every decile must
    // receive floor(n/10) or ceil(n/10) rows
    val n = 1003
    val rnd = new scala.util.Random(7L)
    val df = rnd.shuffle((1 to n).toVector).map(_.toDouble * 1.25).toDF("value")
    val ps = (1 until 10).map(_.toDouble / 10)
    val qs = ExactQuantile.quantiles(df, "value", ps)
      .map(q => BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val bucket = qs.foldLeft(org.apache.spark.sql.functions.lit(1)) { (acc, t) =>
      acc + org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("value") > t, 1).otherwise(0)
    }
    val counts = df.groupBy(bucket.as("b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (1 to 10).toSet, counts.toString)
    counts.values.foreach { c =>
      assert(math.abs(c - n / 10.0) <= 1.0, s"bucket count $c vs ${n / 10.0}")
    }
  }

  test("weightedQuantiles equals quantile over the expanded multiset") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((math.floor(rnd.nextGaussian() * 50) / 10.0,
      1L + rnd.nextInt(40).toLong))
    val df = rows.toDF("v", "w")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = graft.operators.ExactQuantile.weightedQuantiles(df, "v", "w", ps)
    // driver-side expansion + the percentile/quantile_cont formula
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val want = ps.map { p =>
      val h = 1.0 + p * (expanded.length - 1)
      val lo = expanded(math.floor(h).toInt - 1)
      if (h == math.floor(h)) lo
      else lo + (h - math.floor(h)) * (expanded(math.ceil(h).toInt - 1) - lo)
    }
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"weighted quantile drifted: $g vs $w")
    }
  }

  test("weightedQuantiles: forced multi-pass, duplicates, NaN tail, unit weights") {
    val s2 = spark
    import s2.implicits._
    // heavy duplicates + a NaN tail with weight; tiny collectMax forces
    // refinement passes
    val rows = (1 to 500).map(i => ((i % 7).toDouble, (1L + i % 3))) ++
      Seq((Double.NaN, 9L))
    val df = rows.toDF("v", "w")
    val ps = Seq(0.5, 0.95, 1.0)
    val got = graft.operators.ExactQuantile
      .weightedQuantiles(df, "v", "w", ps, buckets = 4, collectMax = 16)
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .sortBy(v => (v.isNaN, v)) // NaN last
    val want = ps.map { p =>
      val h = 1.0 + p * (expanded.length - 1)
      val lo = expanded(math.floor(h).toInt - 1)
      if (h == math.floor(h)) lo
      else lo + (h - math.floor(h)) * (expanded(math.ceil(h).toInt - 1) - lo)
    }
    got.zip(want).foreach { case (g, w) =>
      assert(g == w || (g.isNaN && w.isNaN), s"$g vs $w")
    }
    // weight-1 rows degenerate to the unweighted operator
    val uw = rows.filter(!_._1.isNaN).map(_._1)
    val g1 = graft.operators.ExactQuantile.weightedQuantiles(
      uw.map((_, 1L)).toDF("v", "w"), "v", "w", Seq(0.5))
    val g2 = graft.operators.ExactQuantile.quantiles(
      uw.toDF("v"), "v", Seq(0.5))
    assert(g1 == g2)
  }
}
