package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Independent driver-side replays for the three audits that were
  * oracle-gated only (q181 Benford, q182 sample accuracy, q183 skew
  * planner) — the hash gate proves Spark ≡ DuckDB on the same
  * formulas; these replays prove the formulas themselves compute what
  * the scaladocs claim, from raw rows, with none of either engine's
  * SQL machinery. */
class AuditReplaySpec extends SparkSpec {

  private def md5Mod(s: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16) % m
  }

  test("q181: digit census and chi-square terms replay from raw order totals") {
    val out = SparkEntry.queries("q181_benford_audit")(spark, sfDir).collect()
    val prices = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val digits = prices.map(p =>
      math.floor(p * 100).toLong.toString.charAt(0).asDigit.toLong)
    val census = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = digits.length.toLong
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L),
      "all nine leading digits must appear")
    out.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == census(d), s"digit $d count")
      val expd = nTotal.toDouble * (math.log(1.0 + 1.0 / d) / math.log(10.0))
      val chi = ((census(d) - expd) * (census(d) - expd)) / expd
      // Spark's round() on double goes through BigDecimal.valueOf
      // (shortest-repr HALF_UP); math.round floors x+0.5 — allow 1
      // micro-unit of representational slack
      assert(math.abs(r.getLong(2) - math.round(1e6 * expd)) <= 1, s"exp d=$d")
      assert(math.abs(r.getLong(3) - math.round(1e6 * chi)) <= 1, s"chi2 d=$d")
    }
    // the TPC-H uniform price generator must FAIL Benford visibly:
    // total chi-square far above the 15.5 (α=0.05, df=8) acceptance cut
    val chi2Total = out.map(_.getLong(3)).sum / 1e6
    assert(chi2Total > 15.5, s"audit failed to flag uniform prices: $chi2Total")
  }

  test("q182: sample membership and Horvitz-Thompson estimate replay row-by-row") {
    val out = SparkEntry.queries("q182_sample_accuracy")(spark, sfDir).collect()
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_extendedprice",
        "l_orderkey", "l_linenumber").collect()
    val byGroup = rows.groupBy(r => (r.getString(0), r.getString(1)))
    assert(out.nonEmpty && out.length == byGroup.size)
    out.foreach { r =>
      val g = byGroup((r.getString(0), r.getString(1)))
      val cents = g.map(x => math.floor(x.getDouble(2) * 100).toLong)
      val inSample = g.map(x =>
        md5Mod(s"${x.getLong(3)}:${x.get(4)}", ScaleQueries.SampleRate) == 0L)
      val exact = cents.sum
      val est = cents.zip(inSample).collect { case (c, true) => c }.sum *
        ScaleQueries.SampleRate
      assert(r.getAs[Long]("n_rows") == g.length.toLong)
      assert(r.getAs[Long]("n_sampled") == inSample.count(identity).toLong)
      assert(r.getAs[Long]("exact_cents") == exact)
      assert(r.getAs[Long]("est_cents") == est)
      val errPm = (1000L * math.abs(est - exact)) / math.max(exact, 1L)
      assert(r.getAs[Long]("err_pm") == errPm)
      assert(r.getAs[Boolean]("within_budget") ==
        (errPm <= ScaleQueries.SampleErrBudgetPm))
    }
  }

  test("q183: partition loads replay; loads conserve; enum key alarms, id key doesn't") {
    val out = SparkEntry.queries("q183_skew_planner")(spark, sfDir).collect()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_type").collect()
    val n = ev.length.toLong
    for ((label, keyOf) <- Seq(
        ("user_id", (r: org.apache.spark.sql.Row) => r.getLong(0).toString),
        ("event_type", (r: org.apache.spark.sql.Row) => r.getString(1)))) {
      val rows = out.filter(_.getAs[String]("key_col") == label)
      val assign = ev.map(r =>
        md5Mod(keyOf(r), ScaleQueries.SkewPlanParts) -> keyOf(r))
      val byPart = assign.groupBy(_._1)
      assert(rows.map(_.getAs[Long]("load_rows")).sum == n,
        s"$label: loads must conserve the row count")
      rows.foreach { r =>
        val p = r.getAs[Long]("partition_id")
        assert(r.getAs[Long]("load_rows") == byPart(p).length.toLong, s"$label/$p")
        assert(r.getAs[Long]("n_keys") == byPart(p).map(_._2).distinct.length.toLong)
        val pm = (1000L * byPart(p).length * ScaleQueries.SkewPlanParts) / n
        assert(r.getAs[Long]("load_pm_of_mean") == pm)
        assert(r.getAs[Boolean]("skew_alarm") == (pm > ScaleQueries.SkewAlarmPm))
      }
    }
    // the decision table's point: the enum key trips the alarm, the
    // high-cardinality key stays balanced
    assert(out.filter(_.getAs[String]("key_col") == "event_type")
      .exists(_.getAs[Boolean]("skew_alarm")), "enum key should alarm")
    assert(!out.filter(_.getAs[String]("key_col") == "user_id")
      .forall(_.getAs[Boolean]("skew_alarm")), "id key should not all-alarm")
  }
}
