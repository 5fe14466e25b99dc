package graft.queries

import graft.SparkSpec

/** Behavioral claims of the q87-q90 quality surface on sf0.001 — the
  * hash gates pin exact values; these pin the PROPERTIES the values
  * must have (drift positivity, detector firing, report completeness). */
class QualityQueriesSpec extends SparkSpec {

  test("q87: range and priority-domain checks fail, the rest pass") {
    val rep = QualityQueries.validationSuite(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep.size == 7)
    assert(!rep("range:o_totalprice"))
    assert(!rep("set:o_orderpriority"))
    assert(rep("not_null:o_custkey") && rep("not_null:o_orderdate") &&
      rep("set:o_orderstatus") && rep("unique:o_orderkey") && rep("fk:o_custkey"))
  }

  test("q88: diff statuses reconcile to the snapshot sizes") {
    val o = QueryUtil.table(spark, sfDir, "orders")
    val n = o.count()
    val nBase = o.filter(s"o_orderkey % ${QualityQueries.DiffAddedMod} != 0").count()
    val nCur = o.filter(s"o_orderkey % ${QualityQueries.DiffRemovedMod} != 0").count()
    val got = QualityQueries.snapshotDiff(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every status present, and the identities n_base/n_cur decompose
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(got("added") + got("removed") + got("changed") + got("unchanged")
      >= math.max(nBase, nCur))
    assert(nBase == got("removed") + got("changed") + got("unchanged"))
    assert(nCur == got("added") + got("changed") + got("unchanged"))
    assert(got("changed") > 0)
    assert(n >= nBase && n >= nCur)
  }

  test("q89: PSI terms are non-negative, buckets complete, drift detected") {
    val rows = QualityQueries.psiDrift(spark, sfDir).collect()
    val byFeature = rows.groupBy(_.getString(0))
    // 10 decile buckets + the 5 priority categories
    assert(byFeature("o_totalprice").map(_.getString(1)).sorted.toSeq ==
      (1 to 10).map(i => f"d$i%02d"))
    assert(byFeature("o_orderpriority").length == 5)
    // (q-p) and ln(q/p) share sign => every PSI term >= 0 (up to rounding)
    assert(rows.forall(_.getDouble(6) >= -1e-9))
    // the injected shifts are detectable: both features drift
    val psi = byFeature.map { case (f, rs) => f -> rs.map(_.getDouble(6)).sum }
    assert(psi("o_totalprice") > 0.01, psi.toString)
    assert(psi("o_orderpriority") > 0.0005, psi.toString)
    // n_ref accounts for every order (price side counts all rows)
    val n = QueryUtil.table(spark, sfDir, "orders").count()
    assert(byFeature("o_totalprice").map(_.getLong(2)).sum == n)
  }

  test("q97: streaming validation equals the batch compilation of the same checks") {
    val got = QualityQueries.streamValidation(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    val checks = QualityQueries.streamChecks
    val batch = graft.operators.Validation
      .validate(QueryUtil.table(spark, sfDir, "events"), checks)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == batch)
    // the designed failures fail, the null check passes
    val byName = got.map(t => t._1 -> t._3).toMap
    assert(byName("not_null:user_id"))
    assert(!byName("range:value") || !byName("set:event_type"))
  }

  test("q90: the injected spike fires the robust detector in every type") {
    val rows = QualityQueries.rateAnomalies(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)               // n_hours
      assert(r.getDouble(2) >= 0 && r.getDouble(3) >= 0) // median, mad
      assert(r.getLong(4) > 0, s"no anomalies for ${r.getString(0)}")
      assert(r.getLong(4) < r.getLong(1), "detector flags a strict minority")
    }
  }

  test("q129: theta/adjusted means re-derive from exact driver-side moments") {
    val rows = QualityQueries.cupedReadout(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "value", "ts_us").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100).toLong,
        r.getLong(2) < QualityQueries.CupedSplitUs))
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._3).map(_._2).sum, es.filterNot(_._3).map(_._2).sum)
    }.toSeq
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def variant(u: Long): String =
      if (md5hex(s"$u:exp").charAt(0) <= '7') "A" else "B"
    // exact integer moments, theta as one double division — as the query
    val n = BigInt(users.size)
    val sx = users.map(u => BigInt(u._2)).sum
    val sy = users.map(u => BigInt(u._3)).sum
    val sxx = users.map(u => BigInt(u._2) * BigInt(u._2)).sum
    val sxy = users.map(u => BigInt(u._2) * BigInt(u._3)).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val meanX = sx.toDouble / n.toDouble
    rows.foreach { r =>
      val vs = users.filter(u => variant(u._1) == r.getString(0))
      assert(r.getLong(1) == vs.size.toLong)
      assert(r.getLong(2) == vs.map(_._2).sum && r.getLong(3) == vs.map(_._3).sum)
      assert(r.getLong(4) == math.round(1000000d * theta))
      val meanY = vs.map(_._3).sum.toDouble / vs.size / 100d
      assert(math.abs(r.getDouble(5) - meanY) < 1e-6)
      val adj = meanY - theta * (vs.map(_._2).sum.toDouble / vs.size / 100d - meanX / 100d)
      assert(math.abs(r.getDouble(6) - adj) < 1e-6)
    }
    // CUPED exists to cut variance: the pooled reduction must be real
    // (pre/post spend of the same user correlates) and a proper fraction
    val red = rows.head.getLong(7)
    assert(red > 0 && red < 1000, s"var_reduction_pm $red")
    assert(rows.map(_.getLong(7)).distinct.length == 1)
  }

  test("q137: streamed PSI monitor lands on the batch drift report exactly") {
    val stream = QualityQueries.streamPsiDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val batch = QualityQueries.psiDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("q132: cascade conserves rows, residuals pinned 0, purge re-derivable") {
    import org.apache.spark.sql.functions.col
    val rows = QualityQueries.forgetAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.foreach { case (t, (before, purged, after, residual, _)) =>
      assert(before == purged + after, s"$t not conserved")
      assert(residual == 0L, s"$t residual")
      assert(purged > 0L, s"$t purge fixture degenerate")
    }
    // customer purge really is the %37 cohort, checksum included
    val cust = QueryUtil.table(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val cohort = cust.filter(_ % QualityQueries.ForgetMod == 0)
    assert(rows("customer")._2 == cohort.length.toLong)
    assert(rows("customer")._5 == cohort.sum)
    // lineitem purge equals a direct two-hop recount
    val orders = QueryUtil.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delOrd = orders.filter(o => o._2 % QualityQueries.ForgetMod == 0)
      .map(_._1).toSet
    val li = QueryUtil.table(spark, sfDir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(rows("lineitem")._2 == li.count(delOrd.contains).toLong)
  }

  test("q147: replica means re-derive from the driver-side Poisson draw; CI ordered") {
    val rows = QualityQueries.bootstrapCi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, mean, lo, hi) =>
      assert(lo <= hi, t)
      assert(lo <= mean && mean <= hi, s"$t: 90% CI should bracket the mean here")
      assert(n > 0, t)
    }
    // full driver recompute of every replica mean for one type
    import graft.text.Hashing
    val ev = QueryUtil.table(spark, sfDir, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val t0 = rows.head._1
    def weight(u: Long): Long = {
      val th = QualityQueries.BootPoisson
      th.indexWhere(u < _) match { case -1 => 4L; case k => k.toLong }
    }
    val ms = (1 to QualityQueries.BootB).map { b =>
      var wc = 0L; var wn = 0L
      ev.foreach { case (t, id, v) =>
        if (t == t0) {
          val w = weight(Hashing.h60Jvm(s"$id:$b") % 1000000L)
          wc += w * math.floor(v * 100d).toLong; wn += w
        }
      }
      wc / wn
    }.sorted
    assert(rows.head._4 == ms(1) && rows.head._5 == ms(QualityQueries.BootB - 2),
      s"CI endpoints drifted from the driver recompute: $ms")
  }

  test("q157: streamed hourly series lands on the batch anomaly report exactly") {
    val stream = QualityQueries.streamRateAnomalies(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    val batch = QualityQueries.rateAnomalies(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(stream.nonEmpty && stream.toSeq == batch.toSeq)
    // the injected spike is detected through the streaming path too
    assert(stream.map(_._5).sum > 0)
  }

  test("q176: anonymity audit equals a driver replay of the class census") {
    import QualityQueries.{AnonK, AnonL}
    val r = QualityQueries.anonymityAudit(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7), r.getBoolean(8))
    val rows = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(org.apache.spark.sql.functions.col("c_nationkey").cast("long"),
        org.apache.spark.sql.functions.col("c_mktsegment"),
        org.apache.spark.sql.functions.expr(
          "cast(floor(c_acctbal / 1000) as long)"))
      .collect().map(x => ((x.getLong(0), x.getString(1)), x.getLong(2)))
    val classes = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.length.toLong, xs.map(_._2).distinct.length.toLong)
    }
    val want = (rows.length.toLong, classes.length.toLong,
      classes.map(_._1).min, classes.count(_._1 < AnonK).toLong,
      classes.filter(_._1 < AnonK).map(_._1).sum,
      classes.map(_._2).min, classes.count(_._2 < AnonL).toLong,
      classes.count(_._1 < AnonK) == 0, classes.count(_._2 < AnonL) == 0)
    assert(got == want)
    // conservation: rows in classes sum to the table
    assert(classes.map(_._1).sum == rows.length.toLong)
  }

  test("q223: t-closeness distances equal a driver-side reference; bounds hold") {
    val cust = QueryUtil.table(spark, sfDir, "customer")
      .selectExpr("cast(c_nationkey as long)", "c_mktsegment",
        "cast(floor(c_acctbal / 1000) as long)")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val global = cust.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val bands = global.keys.toSeq.sorted
    val nn = cust.size.toLong
    val m = bands.size.toLong
    val want = cust.groupBy(_._1).map { case ((nat, seg), xs) =>
      val nc = xs.size.toLong
      val cb = xs.groupBy(_._2).map { case (b, ys) => b -> ys.size.toLong }
      val tvdNum = bands.map(b =>
        math.abs(cb.getOrElse(b, 0L) * nn - global(b) * nc)).sum
      var (cumCb, cumB) = (0L, 0L)
      val emdNum = bands.map { b =>
        cumCb += cb.getOrElse(b, 0L); cumB += global(b)
        math.abs(cumCb * nn - cumB * nc)
      }.sum
      val tvd = (1000L * tvdNum) / (2L * nc * nn)
      val emd = (1000L * emdNum) / (math.max(m - 1, 1L) * nc * nn)
      (nat, seg) -> (nc, tvd, emd,
        tvd <= QualityQueries.TcloseT && emd <= QualityQueries.TcloseT)
    }
    val got = QualityQueries.tclosenessAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == want)
    // distances are per-mille probabilities
    got.values.foreach { case (_, tvd, emd, _) =>
      assert(tvd >= 0 && tvd <= 1000 && emd >= 0 && emd <= 1000) }
    // every class is present
    assert(got.keySet == cust.map(_._1).toSet)
  }

  test("q225: exact KS statistic equals a driver-side reference; gate is sane") {
    val ev = QueryUtil.table(spark, sfDir, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byG = ev.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val types = byG.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield {
      val (a, b) = (types(i), types(j))
      val (xa, xb) = (byG(a), byG(b))
      val (na, nb) = (xa.size.toLong, xb.size.toLong)
      val grid = (xa ++ xb).distinct.sorted
      val dnum = grid.map { v =>
        val ca = xa.count(_ <= v).toLong
        val cb = xb.count(_ <= v).toLong
        math.abs(ca * nb - cb * na)
      }.max
      val dp = (1000L * dnum) / (na * nb)
      (a, b) -> (na, nb, dp,
        dp * dp * na * nb > QualityQueries.KsC2E4 * 100L * (na + nb))
    }).toMap
    val got = QualityQueries.ksDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == want)
    // all G(G-1)/2 pairs, statistic within per-mille probability bounds
    val g = types.size
    assert(got.size == g * (g - 1) / 2)
    got.values.foreach { case (_, _, dp, _) => assert(dp >= 0 && dp <= 1000) }
    // same-distribution synthetic slices of one type should NOT reject:
    // split 'click' by parity of an arbitrary stable key (its own index)
    val clicks = byG(types.head).sorted
    val (even, odd) = clicks.zipWithIndex.partition(_._2 % 2 == 0)
    val (xa, xb) = (even.map(_._1), odd.map(_._1))
    val (na, nb) = (xa.size.toLong, xb.size.toLong)
    val dnum = (xa ++ xb).distinct.sorted.map { v =>
      math.abs(xa.count(_ <= v).toLong * nb - xb.count(_ <= v).toLong * na)
    }.max
    val dp = (1000L * dnum) / (na * nb)
    assert(!(dp * dp * na * nb > QualityQueries.KsC2E4 * 100L * (na + nb)),
      s"interleaved same-distribution halves rejected (dp=$dp)")
  }

  test("q227: MAD fences equal a driver-side reference; breakdown robustness") {
    val ev = QueryUtil.table(spark, sfDir, "events")
      .selectExpr("event_type", "cast(floor(value * 100) as long)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((xs.size + 1) / 2 - 1) // ceil(n/2)-th smallest, 0-indexed
    }
    val want = ev.groupBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      val no = vs.count(v =>
        math.abs(v - med) * 10000L > QualityQueries.MadK3E4 * mad).toLong
      g -> (vs.size.toLong, med, mad, no, 1000L * no / vs.size)
    }
    val got = QualityQueries.madOutliers(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // robustness: the fence flags a strict minority per group (50%
    // breakdown means MAD can never declare most of the data outlying)
    got.values.foreach { case (n, _, mad, no, _) =>
      assert(mad > 0, "degenerate MAD on a continuous value column")
      assert(no * 2 < n, s"fence flagged $no of $n")
    }
  }

  test("q230: chi2 equals a driver-side reference; empty cells contribute") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val rm = docs.groupBy(_._1).map { case (l, xs) => l -> xs.size.toLong }
    val cm = docs.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val oc = docs.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val chi2 = (for { (l, r) <- rm; (s, c) <- cm } yield {
      val o = oc.getOrElse((l, s), 0L)
      val d = o * n - r * c
      1000L * d * d / (r * c * n)
    }).sum
    val row = QualityQueries.chi2Independence(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == rm.size.toLong)
    assert(row.getLong(2) == cm.size.toLong)
    assert(row.getLong(3) == (rm.size - 1L) * (cm.size - 1L))
    assert(row.getLong(4) == chi2)
    assert(row.getBoolean(5) ==
      (chi2 > QualityQueries.Chi2Crit76Milli))
    // at least one structurally-empty cell exists and is counted
    assert(oc.size < rm.size * cm.size,
      "corpus has no empty (lang, source) cell; the empty-cell path is untested")
    // a perfectly-independent synthetic grid scores ~0: uniform 2x2
    val unif = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    val un = unif.length.toLong
    val uchi = (for {
      (l, r) <- unif.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      (s, c) <- unif.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    } yield {
      val o = unif.count(p => p._1 == l && p._2 == s).toLong
      val d = o * un - r * c
      1000L * d * d / (r * c * un)
    }).sum
    assert(uchi == 0L)
  }

  test("q235: doubled U equals a driver-side pair count; U_a + U_b conserves") {
    val ev = QueryUtil.table(spark, sfDir, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byG = ev.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val types = byG.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield {
      val (a, b) = (types(i), types(j))
      val (xa, xb) = (byG(a), byG(b))
      val (na, nb) = (xa.size.toLong, xb.size.toLong)
      // brute force: U2 = 2#{x>y} + #{x=y}
      var u2 = 0L
      xa.foreach(x => xb.foreach { y =>
        if (x > y) u2 += 2 else if (x == y) u2 += 1 })
      val eff = 1000L * u2 / (na * nb)
      val dev = 1000L * math.abs(u2 - na * nb) / (na * nb)
      (a, b) -> (na, nb, u2, eff,
        3L * dev * dev * na * nb > QualityQueries.MwZ2E6 * (na + nb + 1))
    }).toMap
    val got = QualityQueries.mannWhitney(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap
    assert(got == want)
    // conservation: U2_a + U2_b = 2·n_a·n_b (each cross pair counted
    // twice in total) — a property brute force satisfies by symmetry,
    // asserted here on the engine output via the reversed computation
    got.foreach { case ((a, b), (na, nb, u2, _, _)) =>
      var u2rev = 0L
      byG(b).foreach(y => byG(a).foreach { x =>
        if (y > x) u2rev += 2 else if (y == x) u2rev += 1 })
      assert(u2 + u2rev == 2L * na * nb, s"($a,$b)")
    }
  }

  test("q238: kappa equals a reference from q15's confusion matrix; bounds hold") {
    // q15's published confusion matrix IS the cell table kappa reduces
    val conf = graft.SparkEntry.queries("q15_langid")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = conf.values.sum
    val diag = conf.collect { case ((l, p), o) if l == p => o }.sum
    val rm = conf.groupBy(_._1._1).map { case (l, xs) => l -> xs.values.sum }
    val cm = conf.groupBy(_._1._2).map { case (p, xs) => p -> xs.values.sum }
    val rc = rm.keys.map(l => rm(l) * cm.getOrElse(l, 0L)).sum
    val wantKappa =
      if (n * diag - rc >= 0) 1000L * (n * diag - rc) / (n * n - rc)
      else -(1000L * (rc - n * diag) / (n * n - rc))
    val row = QualityQueries.cohensKappa(spark, sfDir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == diag)
    assert(row.getLong(2) == 1000L * diag / n)
    assert(row.getLong(3) == 1000L * rc / (n * n))
    assert(row.getLong(4) == wantKappa)
    // kappa <= accuracy always (the chance correction only shrinks it)
    // and is a valid agreement coefficient; at this tiny SF the
    // heuristic lands BELOW chance, so the negative symmetric-truncation
    // branch is the one exercised end-to-end
    assert(row.getLong(4) >= -1000 && row.getLong(4) <= row.getLong(2))
  }

  test("q239: MI/entropies equal a driver reference; information inequalities") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val oc = docs.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val rm = docs.groupBy(_._1).map { case (l, xs) => l -> xs.size.toLong }
    val cm = docs.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    def q(x: Double): Long = math.round(1e6 * x)
    val minum = oc.map { case ((l, s), o) =>
      o * q(math.log(o.toDouble * n) - math.log(rm(l).toDouble * cm(s)))
    }.sum
    val hlnum = rm.values.map(r => r * q(math.log(n.toDouble) - math.log(r.toDouble))).sum
    val hsnum = cm.values.map(c => c * q(math.log(n.toDouble) - math.log(c.toDouble))).sum
    def sdiv(a: Long, b: Long): Long = if (a >= 0) a / b else -((-a) / b)
    val mi = sdiv(minum, n)
    val row = QualityQueries.mutualInformation(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == mi)
    assert(row.getLong(2) == hlnum / n && row.getLong(3) == hsnum / n)
    assert(row.getLong(4) ==
      (if (mi >= 0) 1000L * mi / (hlnum / n) else -(1000L * -mi / (hlnum / n))))
    // information inequalities (up to micronat quantization slack):
    // 0 <~ MI <= min(H_lang, H_source); entropies positive
    assert(row.getLong(2) > 0 && row.getLong(3) > 0)
    assert(row.getLong(1) >= -100 &&
      row.getLong(1) <= math.min(row.getLong(2), row.getLong(3)) + 100)
  }

  test("q242: VMR equals a driver reference over per-user-day counts") {
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .selectExpr("event_type", "user_id", "ts_us div 86400000000 as day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).map { case (g, xs) =>
      val counts = xs.groupBy(e => (e._2, e._3)).map(_._2.size.toLong).toSeq
      val n = counts.size.toLong
      val sx = counts.sum
      val sxx = counts.map(x => x * x).sum
      val vmr = 1000L * (n * sxx - sx * sx) / (math.max(n - 1, 1L) * sx)
      g -> (n, sx, 1000L * sx / n, vmr,
        vmr > QualityQueries.BurstyVmrPermille)
    }
    val got = QualityQueries.dispersionAudit(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(got == want)
    // VMR is a valid non-negative dispersion; active cells conserve events
    got.values.foreach { case (n, sx, mean, vmr, _) =>
      assert(vmr >= 0 && n > 0 && sx >= n && mean >= 1000)
    }
  }

  test("q244: NDCG audit equals a driver replay; DCG never exceeds IDCG") {
    import ScaleQueries.{Bm25Query, MinTermLen}
    val out = QualityQueries.ndcgAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    // the ranking under audit, as published by q63
    val ranked = ScaleQueries.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // independent relevance grading from the raw corpus
    val relOf = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("[^a-z]+")
          .filter(_.length >= MinTermLen).toSet
        r.getLong(0) -> Bm25Query.count(toks.contains).toLong
      }.toMap.withDefaultValue(0L)
    def disc(pos: Long): Long = math.round(1e6 / (math.log(pos + 1.0) / math.log(2.0)))
    def gain(rel: Long): Long = (1L << rel) - 1L
    val ideal = relOf.toSeq.filter(_._2 > 0).sortBy { case (id, r) => (-r, id) }
      .take(out.length)
    var dcg = 0L; var idcg = 0L
    for (((pos, docId, rel, g, d, dcgQ, idcgQ, ndcgQ), i) <- out.zipWithIndex) {
      assert(pos == i + 1L)
      assert(docId == ranked(i)._1, s"pos $pos ranking")
      assert(rel == relOf(docId), s"pos $pos rel")
      assert(g == gain(rel) && d == disc(pos), s"pos $pos gain/disc")
      dcg += g * d
      if (i < ideal.length) idcg += gain(ideal(i)._2) * disc(pos)
      assert((dcgQ, idcgQ) == ((dcg, idcg)), s"pos $pos cumulative")
      assert(ndcgQ == 1000L * dcg / math.max(idcg, 1L), s"pos $pos ndcg")
      assert(dcg <= idcg, s"pos $pos DCG > IDCG")
      assert(ndcgQ >= 0 && ndcgQ <= 1000)
      // every scored doc has tf > 0 on some query term, so rel >= 1
      assert(rel >= 1, s"pos $pos scored doc with zero relevance")
    }
  }

  test("q248: Kruskal-Wallis equals a driver replay of the rank fold") {
    val row = QualityQueries.kruskalWallis(spark, sfDir).collect().head
    val (n, k, df, h, tc, hc, crit, reject) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6), row.getBoolean(7))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
    assert(n == docs.length.toLong && k == docs.map(_._1).distinct.length.toLong)
    assert(df == k - 1)
    // doubled average ranks per distinct value
    val byVal = docs.groupBy(_._2).map { case (v, g) => v -> g.size.toLong }
    val sortedVals = byVal.keys.toSeq.sorted
    var cum = 0L
    val dr = sortedVals.map { v =>
      cum += byVal(v); v -> (2 * cum - byVal(v) + 1) }.toMap
    val per = docs.groupBy(_._1).map { case (_, g) =>
      (g.map(d => dr(d._2)).sum, g.size.toLong) }
    val ssum = per.map { case (s, ni) => s * s / ni }.sum
    val hRef = 3000L * ssum / (n * (n + 1)) - 3000L * (n + 1)
    val tsum = byVal.values.map(c => c * c * c - c).sum
    val tcRef = 1000000L - 1000000L * tsum / (n * n * n - n)
    assert((h, tc) == ((hRef, tcRef)))
    val hcRef = if (hRef >= 0) hRef * 1000000L / tcRef
                else -((-hRef) * 1000000L / tcRef)
    assert(hc == hcRef && crit == QualityQueries.KwCritDf19Milli)
    assert(reject == (df == 19L && hc > crit))
    // ties exist in a bounded length domain, so the correction bites
    assert(tc < 1000000L && tc > 0L)
  }

  test("q252: McNemar equals a driver replay of both labelers") {
    import graft.text.TextStats
    val row = QualityQueries.mcnemarTest(spark, sfDir).collect().head
    val (n, aCorr, bCorr, n10, n01, chi2, reject) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
      row.getLong(5), row.getBoolean(6))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def predA(text: String): String = {
      val toks = text.trim.toLowerCase.split("\\s+")
      // the langIdFromScores fold: strictly-greater wins, seed = first lang
      var best = ("", -1L)
      for ((lang, markers) <- TextStats.langMarkers) {
        val s = toks.count(markers.contains).toLong
        if (best._2 < 0) best = (lang, s)
        else if (s > best._2) best = (lang, s)
      }
      if (best._2 == 0L) "und" else best._1
    }
    def predB(text: String): Boolean = {
      val toks = text.trim.toLowerCase.split("\\s+")
      1000L * toks.count(TextStats.stopwords.contains) / toks.length >=
        QualityQueries.McNemarBPm
    }
    val flags = docs.map { case (lang, text) =>
      (lang == "en", predA(text) == "en", predB(text)) }
    val (b, c) = (flags.count(f => f._2 == f._1 && f._3 != f._1).toLong,
      flags.count(f => f._2 != f._1 && f._3 == f._1).toLong)
    assert(n == docs.length.toLong)
    assert(aCorr == flags.count(f => f._2 == f._1).toLong)
    assert(bCorr == flags.count(f => f._3 == f._1).toLong)
    assert((n10, n01) == ((b, c)))
    val d = math.abs(b - c) - 1
    assert(chi2 == 1000L * d * d / math.max(b + c, 1L))
    assert(reject == (chi2 > QualityQueries.McNemarCritMilli))
    // the paired design is informative: discordant pairs exist
    assert(b + c > 0)
  }

  test("q253: Kendall length-bias equals a driver pair enumeration") {
    import graft.queries.ScaleQueries
    val row = QualityQueries.kendallLengthBias(spark, sfDir).collect().head
    val (k, np, c, d, t, tauA, tau2) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6))
    assert(k == ScaleQueries.Bm25TopK.toLong)
    val ranked = ScaleQueries.bm25(spark, sfDir).collect().map(_.getLong(0))
    val lens = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z]+")
          .count(_.length >= ScaleQueries.MinTermLen).toLong)
      .toMap
    val ys = ranked.map(lens)
    var (cc, dd, tt) = (0L, 0L, 0L)
    for (i <- ys.indices; j <- (i + 1) until ys.length) {
      if (ys(i) < ys(j)) cc += 1
      else if (ys(i) > ys(j)) dd += 1
      else tt += 1
    }
    assert(np == ys.length.toLong * (ys.length - 1) / 2)
    assert((c, d, t) == ((cc, dd, tt)), "pair counts")
    assert(cc + dd + tt == np)
    def peel(num: Long, den: Long): Long =
      if (num >= 0) 1000L * num / den else -(1000L * (-num) / den)
    assert(tauA == peel(cc - dd, np))
    val den = math.max(np * (np - tt), 1L)
    assert(tau2 == (if (cc >= dd) 1000L * (cc - dd) * (cc - dd) / den
                    else -(1000L * (cc - dd) * (cc - dd) / den)))
    assert(math.abs(tauA) <= 1000L && math.abs(tau2) <= 1000L)
  }

  test("q258: chi2 drill-down equals a driver replay; residuals recompose chi2") {
    val out = QualityQueries.chi2CellDrilldown(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5),
          r.getLong(6))))
    assert(out.nonEmpty)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val oc = docs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rm = docs.groupBy(_._1).map { case (l, g) => l -> g.size.toLong }
    val cm = docs.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    val n = docs.length.toLong
    val mindim = math.max(math.min(rm.size - 1, cm.size - 1), 1L)
    // full grid, zero cells included
    assert(out.length == rm.size * cm.size)
    var chi2 = 0L
    for (((l, s), (o, em, res, flag, _)) <- out) {
      assert(o == oc.getOrElse((l, s), 0L), s"$l/$s o")
      assert(em == 1000L * rm(l) * cm(s) / n, s"$l/$s e")
      val d = o * n - rm(l) * cm(s)
      val mag = 1000L * d * d / (rm(l) * cm(s) * n)
      assert(res == (if (d >= 0) mag else -mag), s"$l/$s residual")
      assert(flag == (math.abs(res) > QualityQueries.ResidualFlagMilli))
      chi2 += mag
    }
    // |residual²| sums back to q230's chi2; V² consistent with it
    val v2 = out.head._2._5
    assert(out.forall(_._2._5 == v2))
    assert(v2 == chi2 / (n * mindim))
    assert(v2 >= 0 && v2 <= 1000L)
    // at least one driving cell is flagged on the real corpus
    assert(out.exists(_._2._4))
  }

  test("q259: EB shrinkage equals a driver replay; shrunk rates move toward the prior") {
    val out = QualityQueries.ebShrinkage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getBoolean(8)))
    assert(out.nonEmpty)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val per = docs.groupBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.count(_._2 == "en").toLong) }.toSeq.sortBy(_._1)
    val pPm = per.map { case (_, n, k) => 1000L * k / n }
    val s = per.length.toLong
    val sp = pPm.sum; val spp = pPm.map(p => p * p).sum
    val pbar = sp / s
    val s2 = (s * spp - sp * sp) / (s * math.max(s - 1, 1L))
    val m = if (s2 > 0) 1000L * pbar * (1000 - pbar) / s2 - 1000L else -1L
    val (a, b) = if (m > 0) (pbar * m / 1000L, (1000L - pbar) * m / 1000L)
                 else (0L, 0L)
    for (((src, n, k), (oSrc, oN, oK, raw, shrunk, oPbar, oA, oB, valid))
         <- per.zip(out)) {
      assert((oSrc, oN, oK) == ((src, n, k)))
      assert(raw == 1000L * k / n)
      assert(shrunk == 1000L * (1000L * k + a) / (1000L * n + a + b))
      assert((oPbar, oA, oB) == ((pbar, a, b)))
      assert(valid == (m > 0))
      if (m > 0) {
        // shrinkage moves toward the prior mean, never past it
        assert((raw <= oPbar && shrunk >= raw - 1 && shrunk <= oPbar + 1) ||
               (raw >= oPbar && shrunk <= raw + 1 && shrunk >= oPbar - 1),
          s"$src raw=$raw shrunk=$shrunk pbar=$oPbar")
      } else assert(shrunk == raw)
    }
  }

  test("q260: power audit equals a driver replay of the design formula") {
    val out = QualityQueries.powerAudit(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getBoolean(8), r.getBoolean(9))))
    assert(out.nonEmpty)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val per = docs.groupBy(_._1).map { case (s, g) =>
      s -> (g.size.toLong, 1000L * g.count(_._2 == "en") / g.size) }
    val srcs = per.keys.toSeq.sorted
    assert(out.length == srcs.length * (srcs.length - 1) / 2)
    for (((sa, sb), (na, nb, pa, pb, diff, nreq, dz, powered)) <- out) {
      val (rna, rpa) = per(sa); val (rnb, rpb) = per(sb)
      assert((na, nb, pa, pb) == ((rna, rnb, rpa, rpb)), s"$sa/$sb base")
      assert(diff == rpa - rpb)
      val v = rpa * (1000 - rpa) + rpb * (1000 - rpb)
      val d2 = (rpa - rpb) * (rpa - rpb)
      val want = if (d2 == 0) 0L
        else (QualityQueries.PowerZ2Micro * v + 1000000L * d2 - 1) /
          (1000000L * d2)
      assert(nreq == want, s"$sa/$sb n_required")
      assert(dz == (d2 == 0))
      assert(powered == (d2 != 0 && math.min(rna, rnb) >= want))
    }
    // tiny observed gaps need astronomically more data than is present
    assert(out.exists(r => !r._2._7 && !r._2._8))
  }

  test("q262: Cochran's Q equals a driver replay of the three labelers") {
    import graft.text.TextStats
    val row = QualityQueries.cochranQ(spark, sfDir).collect().head
    val (n, g1, g2, g3, sl, sll, q, rej) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6), row.getBoolean(7))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val enMarkers = TextStats.langMarkers.toMap.apply("en").toSet
    val bits = docs.map { case (lang, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val gold = lang == "en"
      var best = ("", -1L)
      for ((l, ms) <- TextStats.langMarkers) {
        val s = toks.count(ms.contains).toLong
        if (best._2 < 0 || s > best._2) best = (l, s)
      }
      val pred1 = (if (best._2 == 0L) "und" else best._1) == "en"
      val pred2 = 1000L * toks.count(TextStats.stopwords.contains) /
        toks.length >= QualityQueries.McNemarBPm
      val pred3 = toks.count(enMarkers.contains) >= 1
      (if (pred1 == gold) 1L else 0L, if (pred2 == gold) 1L else 0L,
        if (pred3 == gold) 1L else 0L)
    }
    val (rg1, rg2, rg3) = (bits.map(_._1).sum, bits.map(_._2).sum,
      bits.map(_._3).sum)
    val ls = bits.map(b => b._1 + b._2 + b._3)
    assert((n, g1, g2, g3) == ((docs.length.toLong, rg1, rg2, rg3)))
    assert((sl, sll) == ((ls.sum, ls.map(l => l * l).sum)))
    def sq(x: Long) = x * x
    val num = 1000L * 2 * (sq(3 * rg1 - sl) + sq(3 * rg2 - sl) +
      sq(3 * rg3 - sl))
    assert(q == num / math.max(3 * (3 * sl - sll), 1L))
    assert(rej == (q > QualityQueries.CochranCritMilli))
    // the three detectors genuinely differ somewhere (not unanimous)
    assert(3 * sl - sll > 0)
  }
}
