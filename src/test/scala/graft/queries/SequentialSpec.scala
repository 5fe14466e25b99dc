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
}
