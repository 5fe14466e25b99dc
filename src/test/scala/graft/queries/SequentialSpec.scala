package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Closed-form gates for the q298 SPRT walk and the q299 conformal
  * bound (the sequential/conformal inference cells). */
class SequentialSpec extends SparkSpec {

  test("SPRT gate: constants, first crossing, and verdict on sf0.001") {
    // the walk is a pure function of the event order; recompute it
    // driver-side from the same constants and compare the gated row
    val row = graft.SparkEntry
      .queries("q298_sprt_monitor")(spark, sfDir).collect().head
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select(col("ts_us"), col("event_id"),
        (col("event_type") === "purchase").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(t => (t._1, t._2))
    var llr = 0L
    var crossedAt = 0L
    var llrAt = 0L
    ev.zipWithIndex.foreach { case ((_, _, p), i) =>
      llr += (if (p) QualityQueries.SprtUpMilli
              else QualityQueries.SprtDownMilli)
      if (crossedAt == 0L && math.abs(llr) >= QualityQueries.SprtBoundMilli) {
        crossedAt = i + 1L; llrAt = llr
      }
    }
    assert(row.getAs[Long]("n_events") == ev.length)
    assert(row.getAs[Long]("final_llr_milli") == llr)
    assert(row.getAs[Long]("decided_at_n") == crossedAt)
    assert(row.getAs[Long]("llr_at_decision_milli") == llrAt)
    val expectVerdict =
      if (crossedAt == 0L) "continue"
      else if (llrAt > 0) "accept_h1" else "accept_h0"
    assert(row.getAs[String]("verdict") == expectVerdict)
    // the sf corpus's purchase share (~0.2) is below p0 = 0.25: the
    // walk must decide, and decide H0
    assert(expectVerdict == "accept_h0")
  }

  test("conformal bound: rank-r order statistic and coverage arithmetic") {
    val row = graft.SparkEntry
      .queries("q299_conformal_bound")(spark, sfDir).collect().head
    val scored = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        round(graft.text.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cal = scored.filter(_._1 % CurationQueries.ConformalCalMod == 0)
      .map(_._2).sorted
    val eval = scored.filter(_._1 % CurationQueries.ConformalCalMod != 0)
      .map(_._2)
    val r = (CurationQueries.ConformalAlphaPm * (cal.length + 1)) / 1000
    val bound = cal(r.toInt - 1) // r-th smallest, 1-indexed
    assert(row.getAs[Long]("n_cal") == cal.length)
    assert(row.getAs[Long]("n_eval") == eval.length)
    assert(row.getAs[Long]("lower_bound_score") == bound)
    val covered = eval.count(_ >= bound).toLong
    assert(row.getAs[Long]("n_covered") == covered)
    assert(row.getAs[Long]("coverage_pm") == 1000L * covered / eval.length)
    // the split-conformal property this exists for: empirical coverage
    // lands at/above 1 - alpha up to finite-sample noise (binomial sd
    // ~ sqrt(a(1-a)/n) ~ 15 pm here; allow 3 sd)
    assert(row.getAs[Long]("coverage_pm") >=
      1000L - CurationQueries.ConformalAlphaPm - 45L)
  }

  test("Cliff's delta: brute-force pairwise replay on sf0.001") {
    val rows = graft.SparkEntry
      .queries("q301_cliffs_delta")(spark, sfDir).collect()
    val ev = QueryUtil.table(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byG = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (xs, ys) = (byG(a), byG(b))
      var gt = 0L; var lt = 0L
      for (x <- xs; y <- ys) {
        if (x > y) gt += 1 else if (x < y) lt += 1
      }
      assert(r.getAs[Long]("gt") == gt && r.getAs[Long]("lt") == lt,
        s"($a,$b)")
      assert(r.getAs[Long]("ties") ==
        xs.length.toLong * ys.length - gt - lt)
      val nm = xs.length.toLong * ys.length
      val want = if (gt >= lt) 1000 * (gt - lt) / nm
                 else -(1000 * (lt - gt) / nm)
      assert(r.getAs[Long]("delta_pm") == want)
    }
    assert(rows.length == 10) // 5 event types -> 10 pairs
  }

  test("decision stump: exhaustive Gini split replay on sf0.001") {
    val row = graft.SparkEntry
      .queries("q302_decision_stump")(spark, sfDir).collect().head
    val pairs = PipelineQueries.storedVerifiedPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val scored = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        round(graft.text.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("s"))
      .collect().map(r => (r.getLong(1), if (pairs(r.getLong(0))) 1L else 0L))
    // mirrors the engine's integer Gini side term: n*1e6*Gini(n,p) up
    // to one truncation; Java `/` on the non-negative operands here is
    // the same trunc==floor division as Spark `div` / DuckDB `//`
    def term(n: Long, p: Long): Long =
      if (n > 0) n * 1000000L -
        (1000000L * (p * p + (n - p) * (n - p))) / n
      else 0L
    val nn = scored.length.toLong
    val pp = scored.map(_._2).sum
    val best = scored.map(_._1).distinct.sorted.dropRight(1).map { t =>
      val left = scored.filter(_._1 <= t)
      val nl = left.length.toLong; val pl = left.map(_._2).sum
      (term(nn, pp) - term(nl, pl) - term(nn - nl, pp - pl), t)
    }.maxBy(x => (x._1, -x._2))
    assert(row.getAs[Long]("best_threshold") == best._2)
    val g = best._1
    val want = if (g >= 0) g / nn else -((-g) / nn)
    assert(row.getAs[Long]("gini_gain_micro") == want)
    // a split must separate: the dup rate differs across sides
    assert(row.getAs[Long]("dup_left_pm") !=
      row.getAs[Long]("dup_right_pm"))
  }

  test("capture-recapture: Chapman arithmetic replay on sf0.001") {
    val row = graft.SparkEntry
      .queries("q303_capture_recapture")(spark, sfDir).collect().head
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val c1 = ev.filter(_._2 < mid).map(_._1).toSet
    val c2 = ev.filter(_._2 >= mid).map(_._1).toSet
    val m = (c1 & c2).size.toLong
    val est = (c1.size.toLong + 1) * (c2.size + 1) / (m + 1) - 1
    assert(row.getAs[Long]("n1") == c1.size)
    assert(row.getAs[Long]("n2") == c2.size)
    assert(row.getAs[Long]("m") == m)
    assert(row.getAs[Long]("n_est") == est)
    assert(row.getAs[Long]("n_true") == ev.map(_._1).distinct.length)
    // the estimator should land in the right ballpark on real overlap
    assert(math.abs(row.getAs[Long]("err_pm")) < 500)
  }
}
