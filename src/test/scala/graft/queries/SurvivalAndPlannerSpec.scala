package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q319-q322 contracts: the Kaplan-Meier integer product recurrence
  * replays driver-side and agrees with q277's risk sets; the
  * compaction packer replays from the file inventory; Naive Bayes and
  * the AMS sketch replay from first principles with the exact same
  * integer arithmetic. */
class SurvivalAndPlannerSpec extends SparkSpec {

  test("q319: KM replays from q277's risk sets; survival monotone; Greenwood monotone") {
    val km = graft.SparkEntry
      .queries("q319_kaplan_meier")(spark, sfDir).collect()
    val na = graft.SparkEntry
      .queries("q277_conversion_hazard")(spark, sfDir).collect()
    // identical cohort definition → identical (day, n_at_risk, deaths)
    // rows at death days
    val kmRisk = km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naRisk = na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kmRisk.toSeq == naRisk.toSeq)
    // survival strictly decreases at every published (deaths > 0) day;
    // Greenwood accumulator never decreases
    val surv = km.map(_.getLong(3)).toSeq
    assert(surv == surv.sorted.reverse && surv.distinct == surv)
    val gw = km.map(_.getLong(4)).toSeq
    assert(gw == gw.sorted)
    // replay the recurrence over the published rows: since d = 0 rows
    // multiply by exactly 1 in integer math, folding only the
    // published death rows reproduces surv_micro
    var s = 1000000L
    km.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      s = s * (n - d) / n
      assert(r.getLong(3) == s, s"surv at day ${r.getLong(0)}")
    }
    assert(surv.head < 1000000L)
  }

  test("q320: packer replays from the day-file inventory; bins contiguous and exhaustive") {
    val out = graft.SparkEntry
      .queries("q320_compaction_plan")(spark, sfDir).collect()
    val o = QueryUtil.table(spark, sfDir, "orders")
    val files = o.select(
        expr(s"${QueryUtil.eventTsUsExpr(o.schema, "o_orderdate")}" +
          " div 86400000000").as("day"),
        (lit(40L) + length(col("o_orderpriority")).cast("long")).as("b"))
      .groupBy("day").agg(sum("b").as("bytes"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    val t = ExtendedQueries.CompactTargetBytes
    var cum = 0L
    val want = files.map { case (day, bytes) =>
      val bin = cum / t; cum += bytes; (bin, day, bytes)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, fs) =>
      (bin, fs.length.toLong, fs.map(_._3).sum,
        fs.map(_._2).min, fs.map(_._2).max)
    }
    val got = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    // bins cover disjoint ascending day ranges and tile the inventory
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4)
      case _ =>
    }
    assert(got.map(_._2).sum == files.length.toLong)
    assert(got.map(_._3).sum == files.map(_._2).sum)
    out.foreach(r => assert(r.getAs[Long]("fill_pm") ==
      1000L * r.getLong(2) / t))
  }

  test("q321: NB predictions replay from an independent integer scorer") {
    val out = graft.SparkEntry
      .queries("q321_naive_bayes")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val (train, test) = docs.partition(d => md5hex(d._1 + ":nb")(0) < '8')
    val L = CurationQueries.NbLnMicroTab
    def l(k: Long): Long = L(math.min(k, CurationQueries.NbLnClip.toLong).toInt - 1)
    val csw = train.flatMap(d => d._3.map(w => (d._2, w)))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val vocab = train.flatMap(_._3).distinct.length.toLong
    val perSource = train.groupBy(_._2).map { case (s, ds) =>
      (s, ds.map(_._3.length.toLong).sum, ds.length.toLong)
    }
    val classes = perSource.map { case (s, tok, nd) =>
      (s, l(tok + vocab), l(nd))
    }.toSeq.sortBy(_._1)
    val preds = test.map { case (_, truth, toks) =>
      val best = classes.map { case (s, lden, lprior) =>
        val msum = toks.groupBy(identity).map { case (w, ws) =>
          csw.get((s, w)).map(c => ws.length * l(c + 1)).getOrElse(0L)
        }.sum
        (s, msum - toks.length * lden + lprior)
      }.minBy { case (s, sc) => (-sc, s) }
      (truth, best._1)
    }
    val want = preds.groupBy(_._1).map { case (s, ps) =>
      val correct = ps.count(p => p._2 == p._1).toLong
      (s, ps.length.toLong, correct, 1000L * correct / ps.length)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == want)
  }

  test("q322: AMS sketch replays from first principles; single-key corpus is exact") {
    val out = graft.SparkEntry.queries("q322_ams_f2")(spark, sfDir).head()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keys = QueryUtil.table(spark, sfDir, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val rows = ScaleQueries.AmsRows
    val s = (1 to rows).map { r =>
      keys.map { k =>
        if ("13579bdf".contains(md5hex(s"$k:ams:$r")(0))) 1L else -1L
      }.sum
    }
    val sq = s.map(x => x * x).sorted
    val est = (sq(rows / 2 - 1) + sq(rows / 2)) / 2
    val exact = keys.groupBy(identity).values.map(g => g.length.toLong)
      .map(c => c * c).sum
    assert(out.getLong(0) == rows.toLong)
    assert(out.getLong(1) == est)
    assert(out.getLong(2) == exact)
    assert(out.getLong(3) == 1000L * math.abs(est - exact) / exact)
    // exact regime: a single-key stream makes every row sum ±c, so the
    // median of squares IS F2
    import spark.implicits._
    val one = Seq.fill(7)(42L).toDF("o_custkey")
    one.createOrReplaceTempView("ams_single")
    val c = 7L
    val sOne = (1 to rows).map { r =>
      if ("13579bdf".contains(md5hex(s"42:ams:$r")(0))) c else -c
    }
    assert(sOne.map(x => x * x).distinct == Seq(c * c))
  }
}
