package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 second-batch gates: q275 (blocking audit — exact driver
  * replay of candidates/completeness per key), q276 (RFM — conservation
  * + exact quintile marginals), q277 (Nelson-Aalen — driver estimator
  * replay + monotonicity), q278 (TextRank — driver PageRank replay over
  * the collected word graph), q279 (Burrows' Delta — driver z-score
  * replay). */
class SegmentationAndStyleSpec extends SparkSpec {

  test("q275: per-key candidates/completeness match a driver replay; name17 dominates") {
    val rows = ExtendedQueries.blockingAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("name17", "name_full", "segment"))
    val base = QueryUtil.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = base.length.toLong
    def bSide(k: Long, name: String, seg: String): (String, String) = {
      val nm = if (k % 5 == 1)
        name.init + ((name.last.asDigit + 1) % 10).toString else name
      val sg = if (k % 11 == 3) "REEXTRACT" else seg
      (nm, sg)
    }
    def keyOf(which: String, name: String, seg: String): String = which match {
      case "name17" => name.substring(0, 17)
      case "name_full" => name
      case "segment" => seg
    }
    Seq("name17", "name_full", "segment").foreach { k =>
      val ka = base.map { case (_, nm, sg) => keyOf(k, nm, sg) }
      val kb = base.map { case (id, nm, sg) =>
        val (n2, s2) = bSide(id, nm, sg); keyOf(k, n2, s2) }
      val ca = ka.groupBy(identity).view.mapValues(_.length.toLong)
      val cb = kb.groupBy(identity).view.mapValues(_.length.toLong)
      val cands = ca.keys.filter(cb.contains)
        .map(v => ca(v) * cb(v)).sum
      val found = base.indices.count(i => ka(i) == kb(i)).toLong
      val r = rows(k)
      assert(r.getLong(2) == cands, s"$k candidates")
      assert(r.getLong(4) == 1000 - 1000 * cands / (n * n), s"$k reduction")
      assert(r.getLong(5) == found, s"$k true_found")
      assert(r.getLong(6) == 1000 * found / n, s"$k completeness")
    }
    assert(rows("name17").getLong(6) == 1000L,
      "the production key must survive every perturbation")
    assert(rows("name_full").getLong(6) < 1000L,
      "full-name blocking must lose the typo cohort")
    assert(rows("segment").getLong(4) < rows("name17").getLong(4),
      "segment blocking reduces less")
  }

  test("q276: RFM conserves customers and revenue; exact quintile marginals") {
    val rows = CurationQueries.rfmSegments(spark, sfDir).collect()
    val per = QueryUtil.table(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect()
    val n = per.length.toLong
    assert(rows.map(_.getLong(3)).sum == n)
    assert(rows.map(_.getLong(4)).sum == per.map(_.getLong(1)).sum)
    rows.foreach { r =>
      Seq(0, 1, 2).foreach(i =>
        assert(r.getLong(i) >= 1 && r.getLong(i) <= CurationQueries.RfmBuckets))
    }
    // exact per-axis marginal sizes from the rank→score law
    val expMarginal = (1L to n)
      .groupBy(rnk => CurationQueries.RfmBuckets -
        (rnk - 1) * CurationQueries.RfmBuckets / n)
      .view.mapValues(_.size.toLong).toMap
    Seq(0, 1, 2).foreach { axis =>
      val got = rows.groupBy(_.getLong(axis)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(got == expMarginal, s"axis $axis marginal")
    }
  }

  test("q277: Nelson-Aalen matches a driver estimator replay") {
    val got = SeriesQueries.conversionHazard(spark, sfDir).collect()
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("ts_us div 86400000000").as("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val horizon = ev.map(_._3).max
    val per = ev.groupBy(_._1).iterator.flatMap { case (_, es) =>
      val entry = es.filter(_._2 == "signup").map(_._3)
        .reduceOption(_ min _)
      entry.map { e =>
        val purch = es.filter(x => x._2 == "purchase" && x._3 >= e)
          .map(_._3).reduceOption(_ min _)
        purch match {
          case Some(p) => (p - e, true)
          case None => (horizon - e, false)
        }
      }
    }.toSeq
    val durs = per.groupBy(_._1).map { case (d, xs) =>
      (d, xs.size.toLong, xs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    var cum = 0L
    val exp = durs.flatMap { case (d, _, _) =>
      val atRisk = per.count(_._1 >= d).toLong
      val deaths = durs.find(_._1 == d).get._3
      val hz = 1000000L * deaths / atRisk
      cum += hz
      if (deaths > 0) Some((d, atRisk, deaths, hz, cum)) else None
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == exp)
    // structure: risk sets shrink, cumulative hazard grows
    assert(got.map(_.getLong(1)).toSeq ==
      got.map(_.getLong(1)).sortBy(-_).toSeq)
    assert(got.map(_.getLong(4)).toSeq == got.map(_.getLong(4)).sorted.toSeq)
  }

  test("q278: TextRank matches a driver PageRank replay of the word graph") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(lower(trim(col("text")))).collect().map(_.getString(0))
    val arcs = docs.flatMap { t =>
      val w = t.split("\\s+")
      w.sliding(2).filter(p => p.length == 2 && p(0) != p(1))
        .flatMap(p => Seq((p(0), p(1)), (p(1), p(0))))
    }.distinct
    val unit = graft.operators.PageRank.RankUnit
    val nodes = arcs.map(_._1).distinct
    val deg = arcs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> unit).toMap
    for (_ <- 1 to CleaningQueries.TextRankIterations) {
      val contrib = arcs.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => rank(e._1) / deg(e._1)).sum }
      rank = nodes.map(v =>
        v -> (150000L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    val exp = rank.toSeq.sortBy { case (w, r) => (-r, w) }
      .take(CleaningQueries.TextRankTopK)
    val got = CleaningQueries.textrankKeywords(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("q279: Burrows' Delta matches a driver z-score replay") {
    val stop = graft.text.TextStats.stopwords
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("source"), lower(trim(col("text")))).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).view.mapValues(ds =>
      ds.flatMap(_._2.split("\\s+"))).toMap
    val sources = bySource.keys.toSeq.sorted
    val g = sources.length.toLong
    val f = (for (s <- sources; w <- stop) yield {
      val toks = bySource(s)
      (s, w) -> 1000000L * toks.count(_ == w) / toks.length
    }).toMap
    def zOf(s: String, w: String): Long = {
      val fs = sources.map(x => f((x, w)))
      val sf = fs.sum; val sff = fs.map(x => x * x).sum
      val sd = math.max(math.sqrt((g * sff - sf * sf).toDouble).toLong, 1L)
      1000L * (g * f((s, w)) - sf) / sd
    }
    val got = CleaningQueries.stylometricDelta(spark, sfDir).collect()
    assert(got.length == g * (g - 1) / 2)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == stop.length.toLong)
      val exp = stop.map(w => math.abs(zOf(a, w) - zOf(b, w))).sum /
        stop.length
      assert(r.getLong(3) == exp, s"$a x $b")
    }
  }
}
