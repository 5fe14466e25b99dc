package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SeriesQueriesSpec extends SparkSpec {

  test("q91: funnel stages are monotonically narrowing, conversions in (0,1]") {
    val rows = SeriesQueries.funnel(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val ns = rows.map(_.getLong(1))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.toSeq.toString)
    assert(ns(2) > 0, "funnel bottoms out at zero — fixture too small")
    val conv = rows.map(_.getDouble(2))
    assert(conv(0) == 1.0)
    assert(conv.forall(c => c > 0 && c <= 1.0))
  }

  test("q91: click-before-view users do not count as converted") {
    // user 1: view@10 -> click@20 (converts); user 2: click@5, view@10 (does not)
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L),
      (2L, "click", 5L), (2L, "view", 10L)
    ).toDF("user_id", "event_type", "ts_us")
    // mirror funnel's chained-min logic directly on the crafted frame
    val s1 = ev.filter($"event_type" === "view")
      .groupBy("user_id").agg(min("ts_us").as("prev_ts"))
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts_us" > $"prev_ts")
      .groupBy("user_id").agg(min("ts_us").as("prev_ts"))
    assert(s2.select("user_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("q92: offset-0 rows cover every user; counts never exceed cohort size") {
    val ret = SeriesQueries.cohortRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohortSize = ret.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    assert(cohortSize.nonEmpty)
    // every (cohort, offset>0) count is bounded by the cohort's size
    ret.filter(_._2 > 0).foreach { case (cw, off, n) =>
      assert(n <= cohortSize(cw), s"cohort $cw offset $off: $n")
    }
    // offset-0 totals = number of distinct users with any event
    val users = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum == users)
    assert(ret.forall(_._2 <= SeriesQueries.RetentionMaxWeeks))
  }

  test("q98: regression matches a driver-side recompute; r2 ~ corr^2") {
    val rows = SeriesQueries.groupRegression(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
    val xh0 = ev.agg(min(expr("ts_us div 3600000000"))).first().getLong(0)
    val data = ev.select(col("event_type"),
        (expr("ts_us div 3600000000") - xh0).as("x"),
        floor(col("value") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val pts = data(r.getString(0)).map(t => (t._2.toDouble, t._3.toDouble))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100
      assert(math.abs(r.getDouble(2) - slope) < 1e-4,
        s"${r.getString(0)}: ${r.getDouble(2)} vs $slope")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0000001) // r2 range
    }
    // r2 should equal corr(x, y)^2 computed by Spark's one-pass corr
    val corrByType = ev.select(col("event_type"),
        (expr("ts_us div 3600000000") - xh0).cast("double").as("x"),
        floor(col("value") * 100).cast("double").as("y"))
      .groupBy("event_type").agg(corr("x", "y").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val c2 = corrByType(r.getString(0)) * corrByType(r.getString(0))
      assert(math.abs(r.getDouble(4) - c2) < 1e-4,
        s"${r.getString(0)}: r2 ${r.getDouble(4)} vs corr^2 $c2")
    }
  }

  test("q93: rolling average equals the hand-rolled window on collected days") {
    val rows = SeriesQueries.rollingRevenue(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 30)
    val byDay = rows.map(t => t._1 -> t._2).toMap
    // spot-check every 100th day against a driver-side recompute
    rows.zipWithIndex.filter(_._2 % 100 == 0).map(_._1).foreach {
      case (day, _, avg7, _) =>
        val window = (day - (SeriesQueries.RollingDays - 1) to day)
          .flatMap(byDay.get)
        val expect = BigDecimal(window.sum / window.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(avg7 - expect) < 2e-6, s"day $day: $avg7 vs $expect")
    }
    // cumulative revenue is non-decreasing (prices are positive)
    assert(rows.sliding(2).forall(p => p(0)._4 <= p(1)._4))
  }

  test("q104: top sequences are well-formed, counts descending, K-capped") {
    val rows = SeriesQueries.frequentSequences(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= SeriesQueries.SeqTopK)
    assert(rows.forall(_._1.split(">").length == 3))
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2))
    assert(rows.forall(_._2 > 0))
  }

  test("q104 plan: one exchange+sort serves the whole window stack; scan pruned") {
    val df = SeriesQueries.frequentSequences(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // exchange 1: user_id for all three windows; exchange 2: the
    // trigram-count partial->final aggregate. A third means a window
    // stopped sharing the partitioning.
    assert(nExchanges == 2, s"expected 2 exchanges, got $nExchanges:\n${plan.take(1800)}")
    assert("\\bSort \\[".r.findAllIn(plan).length == 1,
      "all windows must share one sort")
    assert(plan.contains("TakeOrderedAndProject"), "top-K must not global-sort")
    // column pruning: value/props never leave the scan
    assert(!plan.contains("value#") && !plan.contains("props#"), "scan unpruned")
  }

  test("q104: trigrams never cross a session gap (crafted stream)") {
    import spark.implicits._
    // user 1: events A B C | gap | D E F  — the B>C>D and C>D>E windows
    // straddle the gap and must be excluded
    val h = SeriesQueries.SeqGapUs // 12 h
    val df = Seq(
      (1L, 0L * h / 10, "A"), (2L, 1L * h / 10, "B"), (3L, 2L * h / 10, "C"),
      (4L, 2L * h, "D"), (5L, 2L * h + h / 10, "E"), (6L, 2L * h + 2 * h / 10, "F"))
      .toDF("event_id", "us", "event_type")
      .select(col("event_id"), lit(1L).as("user_id"),
        (col("us") * 1000L).as("ts"), col("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("seq104").toFile
    dir.deleteOnExit()
    df.write.parquet(s"$dir/events.parquet")
    val got = SeriesQueries.frequentSequences(spark, dir.toString).collect()
      .map(_.getString(0)).toSet
    assert(got == Set("A>B>C", "D>E>F"), got.toString)
  }

  test("q117: recurrence holds row-by-row; forecasts extrapolate linearly") {
    val rows = SeriesQueries.holtForecast(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val (obs, fc) = rows.partition(!_._5)
    assert(obs.length > 300 && fc.length == SeriesQueries.HoltH)
    // observed side: re-run the integer recurrence from the raw ys
    var (l, b) = (obs.head._2.get, 0L)
    assert(obs.head._3 == l && obs.head._4 == 0L)
    obs.tail.foreach { case (d, y, lg, bg, _) =>
      val lNew = (2 * y.get + 8 * (l + b)) / 10
      val bNew = ((lNew - l) + 9 * b) / 10
      l = lNew; b = bNew
      assert(lg == l && bg == b, s"day $d")
    }
    // forecast side: days contiguous after the last observation,
    // levels exactly linear in the final (l, b)
    val lastDay = obs.last._1
    fc.zipWithIndex.foreach { case ((d, y, lf, bf, _), i) =>
      val h = i + 1
      assert(d == lastDay + h && y.isEmpty)
      assert(lf == l + h * b && bf == b)
    }
  }

  test("q134: transition matrix equals a driver-side recount; rows near-stochastic") {
    val rows = SeriesQueries.markovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = scala.collection.mutable.HashMap.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { es =>
      es.sortBy(e => (e._3, e._2)).map(_._4).sliding(2).foreach {
        case Array(a, b) => trans((a, b)) = trans.getOrElse((a, b), 0L) + 1L
        case _ =>
      }
    }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == trans.toMap)
    // total transitions = sum over users of (n_events - 1)
    val expectedTotal = ev.groupBy(_._1).values.map(_.size - 1).sum.toLong
    assert(rows.map(_._3).sum == expectedTotal)
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      val tot = rs.head._4
      assert(rs.forall(_._4 == tot) && rs.map(_._3).sum == tot, s"$prev row_total")
      // floored per-mille row sums land in (1000 - |row|, 1000]
      val pmSum = rs.map(_._5).sum
      assert(pmSum <= 1000 && pmSum > 1000 - rs.length, s"$prev pm sum $pmSum")
      rs.foreach(r => assert(r._5 == 1000L * r._3 / tot))
    }
  }

  test("q139: gap profile equals a driver-side recompute; quantiles are exact 50ns multiples") {
    val rows = SeriesQueries.interArrivalGaps(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gapsByType = ev.groupBy(e => (e._1, e._4)).values.flatMap { es =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      ts.sliding(2).collect { case Array(a, b) => (es.head._4, b - a) }
    }.toSeq.groupBy(_._1)
    def qcont(sorted: Seq[Long], p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi).toDouble - sorted(lo).toDouble)
    }
    rows.foreach { case (t, n, mean, p50, p95) =>
      val g = gapsByType(t).map(_._2).sorted
      assert(n == g.length.toLong)
      assert(mean == g.sum / g.length)
      assert(p50 == math.round(qcont(g, 0.5) * 1000d), s"$t p50")
      assert(p95 == math.round(qcont(g, 0.95) * 1000d), s"$t p95")
      // the quantization claim: interp fractions are twentieths, so the
      // nano values are exact multiples of 50
      assert(p50 % 50 == 0 && p95 % 50 == 0, s"$t not on the 50ns grid")
      assert(p95 > p50 && p50 > 0)
    }
  }

  test("q141: streamed decay state lands on the batch scores exactly") {
    val stream = SeriesQueries.streamDecayedEngagement(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = SeriesQueries.decayedEngagement(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("q126: decayed scores equal a driver-side recompute; decay actually re-ranks") {
    val rows = SeriesQueries.decayedEngagement(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "value", "ts_us").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val scored = ev.groupBy(_._1).map { case (u, es) =>
      val cents = es.map(e => math.floor(e._2 * 100).toLong)
      val decayed = es.map { e =>
        val ageW = math.min(
          (SeriesQueries.DecayRefUs - e._3) / SeriesQueries.DecayWeekUs,
          SeriesQueries.DecayMaxWeeks)
        math.floor(e._2 * 100).toLong << (SeriesQueries.DecayMaxWeeks - ageW).toInt
      }.sum
      (u, es.length.toLong, cents.sum, decayed)
    }.toSeq
    val expected = scored.sortBy { case (u, _, _, s) => (-s, u) }
      .take(SeriesQueries.DecayTopK)
    assert(rows.toSeq == expected)
    // the weighting is not a constant rescale: decayed rank differs from
    // raw-cents rank somewhere in the head (events spread over 5 weeks)
    val rawHead = scored.sortBy { case (u, _, c, _) => (-c, u) }
      .take(SeriesQueries.DecayTopK).map(_._1)
    assert(rows.map(_._1).toSeq != rawHead)
  }

  test("q160: lateness audit equals a driver-side replay of the arrival overlay") {
    import SeriesQueries.{LateShift, LateMod}
    val rows = SeriesQueries.latenessAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("event_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._2).map { case (t, es) =>
      val ordered = es.map { case (id, _, ts) =>
        (id + (if (id % LateMod == 0) LateShift else 0L), id, ts)
      }.sortBy(e => (e._1, e._2))
      var mx = Long.MinValue
      val lates = ordered.map { case (_, _, ts) =>
        mx = math.max(mx, ts); mx - ts
      }
      def q(p: Double): Long = {
        val s = lates.sorted
        val pos = p * (s.length - 1)
        val lo = s(pos.toInt)
        val hi = s(math.min(s.length - 1, pos.toInt + 1))
        math.round((lo + (pos - pos.toInt) * (hi - lo)) * 1000d)
      }
      (t, es.length.toLong, lates.count(_ > 0).toLong, q(0.5), q(0.95),
        lates.max * 1000L)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == want)
    // the overlay produced real out-of-orderness, bounded below 100%
    val (n, nl) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(nl > 0 && nl < n / 2)
  }

  test("q161: CUSUM equals the driver fold; alarms fire and cluster at bursts") {
    import SeriesQueries.{CusumBurstMod, CusumBurstLen}
    val rows = SeriesQueries.cusumChangepoints(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // recurrence invariants (the fold is its own replay — assert the
    // recurrence directly from consecutive rows instead)
    val n = rows.length.toLong
    val mu = rows.map(_._2).sum / n
    val mad = rows.map(r => math.abs(r._2 - mu)).sum / n
    val (k, h) = (mu / 2, 6L * mad)
    var (sp, sn) = (0L, 0L)
    rows.foreach { case (day, y, gotSp, gotSn, alarm) =>
      sp = math.max(0L, sp + y - mu - k)
      sn = math.max(0L, sn + mu - y - k)
      assert(gotSp == sp && gotSn == sn, s"day $day recurrence drifted")
      assert(alarm == (sp > h || sn > h), s"day $day alarm flag")
    }
    val alarms = rows.filter(_._5)
    assert(alarms.nonEmpty && alarms.length < rows.length / 10)
    // alarms concentrate in/after the deterministic burst windows
    val nearBurst = alarms.count(a => a._1 % CusumBurstMod < CusumBurstLen * 2)
    assert(nearBurst * 10 >= alarms.length * 8,
      s"only $nearBurst/${alarms.length} alarms near bursts")
  }

  test("q162: Holt-Winters equals an independent driver replay; forecast extends the fit") {
    import SeriesQueries.HwPeriod
    val rows = SeriesQueries.holtWinters(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val daily = QueryUtil.table(spark, sfDir, "orders")
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"),
        expr("floor(o_totalprice * 100)").cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("y")).orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val l0 = daily.take(HwPeriod).map(_._2).sum / HwPeriod
    var seas = daily.take(HwPeriod).map(_._2 - l0).toVector
    var (l, b) = (l0, 0L)
    val want = Seq.newBuilder[(Long, Option[Long], Long, Long, Long, Boolean)]
    daily.drop(HwPeriod).foreach { case (d, y) =>
      val s0 = seas.head
      val lN = (2 * (y - s0) + 8 * (l + b)) / 10
      val bN = ((lN - l) + 9 * b) / 10
      val sN = (3 * (y - lN) + 7 * s0) / 10
      l = lN; b = bN; seas = seas.tail :+ sN
      want += ((d, Some(y), l, b, sN, false))
    }
    (1 to HwPeriod).foreach(h =>
      want += ((daily.last._1 + h, None, l + h * b, b, seas(h - 1), true)))
    assert(rows.toSeq == want.result())
    // forecast shape: exactly one period, linear level, seasonals cycle
    val fc = rows.filter(_._6)
    assert(fc.length == HwPeriod)
    assert(fc.map(_._3).toSeq ==
      (1 to HwPeriod).map(h => fc.head._3 + (h - 1) * fc.head._4))
  }

  test("q175: Theil-Sen equals a driver replay; robust to a planted outlier") {
    val r = SeriesQueries.theilSen(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val daily = QueryUtil.table(spark, sfDir, "orders")
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"), expr("floor(o_totalprice * 100)").cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("y")).orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (1000000L * (daily(j)._2 - daily(i)._2)) /
        (daily(j)._1 - daily(i)._1)).sorted
    def med2(xs: Seq[Long]): Long = {
      val h = 1.0 + 0.5 * (xs.length - 1)
      val lo = xs(math.floor(h).toInt - 1)
      if (h == math.floor(h)) 2 * lo
      else math.round(2d * (lo + (h - math.floor(h)) *
        (xs(math.ceil(h).toInt - 1) - lo)))
    }
    val want = (daily.length.toLong, slopes.length.toLong,
      slopes.count(_ > 0).toLong, slopes.count(_ < 0).toLong, med2(slopes))
    assert(got == want)
    // robustness: corrupting ONE day by 100x moves the MEAN slope a lot
    // but the Theil-Sen median barely (breakdown-point demonstration)
    val corrupted = daily.updated(daily.length / 2,
      (daily(daily.length / 2)._1, daily(daily.length / 2)._2 * 100))
    val cSlopes = (for {
      i <- corrupted.indices; j <- (i + 1) until corrupted.length
    } yield (1000000L * (corrupted(j)._2 - corrupted(i)._2)) /
        (corrupted(j)._1 - corrupted(i)._1)).sorted
    val shiftMed = math.abs(med2(cSlopes) - med2(slopes))
    val meanShift = math.abs(cSlopes.sum / cSlopes.length -
      slopes.sum / slopes.length)
    assert(shiftMed * 10 < meanShift,
      s"median shift $shiftMed not robust vs mean shift $meanShift")
  }

  test("q179: freshness audit equals a driver replay of the tail stats") {
    import SeriesQueries.{DecayRefUs, StaleHours}
    val rows = SeriesQueries.freshnessAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("event_type", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).toSeq.map { case (t, es) =>
      val last = es.map(_._2).max
      val stale = (DecayRefUs - last) / 3600000000L
      (t, es.length.toLong, last,
        es.count(_._2 >= DecayRefUs - 86400000000L).toLong,
        es.count(_._2 >= DecayRefUs - 7L * 86400000000L).toLong,
        stale, stale >= StaleHours)
    }.sortBy(_._1)
    assert(rows.toSeq == want)
    // the snapshot instant sits after the data: staleness non-negative
    assert(rows.forall(_._6 >= 0))
  }

  test("q243: Spearman matrix equals a driver replay; centered ranks sum to zero") {
    val out = SeriesQueries.spearmanComovement(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    // independent replay from the raw events
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = ev.map(_._1).distinct.sorted
    val days = ev.map(_._2).distinct.sorted
    val counts = ev.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = days.size.toLong
    // doubled average ranks (2·avg-rank stays integer under ties),
    // centered by their exact mean n+1
    def centered(t: String): Map[Long, Long] = {
      val xs = days.map(d => d -> counts.getOrElse((t, d), 0L))
      val byVal = xs.groupBy(_._2)
      var rank = 1L
      val dr = scala.collection.mutable.Map[Long, Long]()
      for (v <- byVal.keys.toSeq.sorted) {
        val c = byVal(v).size.toLong
        dr(v) = 2 * rank + c - 1
        rank += c
      }
      xs.map { case (d, v) => d -> (dr(v) - (n + 1)) }.toMap
    }
    val cent = types.map(t => t -> centered(t)).toMap
    for (t <- types) assert(cent(t).values.sum == 0L, s"Σc != 0 for $t")
    for ((ta, tb, nd, sxy, sxx, syy, rho2) <- out) {
      assert(nd == n)
      val ca = cent(ta); val cb = cent(tb)
      val rsxy = days.map(d => ca(d) * cb(d)).sum
      val rsxx = days.map(d => ca(d) * ca(d)).sum
      val rsyy = days.map(d => cb(d) * cb(d)).sum
      assert((sxy, sxx, syy) == ((rsxy, rsxx, rsyy)), s"$ta/$tb sums")
      val mag = (BigInt(1000) * BigInt(rsxy) * BigInt(rsxy) /
        BigInt(math.max(rsxx * rsyy, 1L))).toLong
      assert(rho2 == (if (rsxy >= 0) mag else -mag), s"$ta/$tb rho2")
      assert(math.abs(rho2) <= 1000, s"$ta/$tb |rho2| > 1")
    }
    // every unordered type pair reported exactly once
    assert(out.length == types.size * (types.size - 1) / 2)
  }

  test("q245: Ljung-Box equals a driver replay; Q accumulates and rho is bounded") {
    val out = SeriesQueries.ljungBox(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(out.nonEmpty)
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = ev.map(_._1).distinct.sorted
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val n = hi - lo + 1
    val counts = ev.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (t <- types) {
      val xs = (lo to hi).map(d => counts.getOrElse((t, d), 0L))
      val meanMilli = 1000L * xs.sum / n
      val ys = xs.map(x => 1000L * x - meanMilli)
      val a0 = ys.map(y => y * y).sum
      var qCum = 0L
      for (k <- 1L to SeriesQueries.LbMaxLag) {
        val ak = (0 until (n - k).toInt).map(i => ys(i) * ys(i + k.toInt)).sum
        val rho = if (ak >= 0) 1000L * ak / math.max(a0, 1L)
                  else -(1000L * (-ak) / math.max(a0, 1L))
        qCum += n * (n + 2) * rho * rho / (1000L * (n - k))
        val crit = SeriesQueries.LbCritMilli((k - 1).toInt)
        val row = out.find(r => r._1 == t && r._2 == k).get
        assert(row._3 == n, s"$t lag $k n_days")
        assert(row._4 == ak, s"$t lag $k autocov")
        assert(row._5 == rho, s"$t lag $k rho")
        assert(math.abs(rho) <= 1000L, s"$t lag $k |rho| > 1")
        assert(row._6 == qCum, s"$t lag $k qcum")
        assert(row._7 == crit && row._8 == (qCum > crit), s"$t lag $k gate")
      }
    }
    // full coverage: every (type, lag) cell exactly once
    assert(out.length == types.size * SeriesQueries.LbMaxLag.toInt)
  }

  test("q255: runs test equals a driver replay of the sign sequence") {
    val row = SeriesQueries.runsTest(spark, sfDir).collect().head
    val (n, nUp, nDown, runs, z2, rej) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getBoolean(5))
    val daily = QueryUtil.table(spark, sfDir, "orders")
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"), expr("cast(floor(o_totalprice * 100) as long)").as("c"))
      .groupBy("day").agg(sum("c").as("cents"))
      .orderBy("day").collect().map(r => r.getLong(1))
    val ups = daily.sliding(2).collect {
      case Array(a, b) if b != a => b > a }.toSeq
    val runsRef = if (ups.isEmpty) 0L
      else 1L + ups.sliding(2).count { case Seq(a, b) => a != b }.toLong
    assert(n == ups.length.toLong)
    assert(nUp == ups.count(identity).toLong && nDown == ups.count(!_).toLong)
    assert(runs == runsRef)
    val d = runs * n - n - 2 * nUp * nDown
    val den = math.max(2 * nUp * nDown * (2 * nUp * nDown - n), 1L)
    assert(z2 == 1000L * d * d * (n - 1) / den)
    assert(rej == (z2 > SeriesQueries.RunsCritMilli))
    // the series is long enough for the normal approximation to mean anything
    assert(n >= 20 && nUp > 0 && nDown > 0)
  }
}
