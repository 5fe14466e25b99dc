package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q329/q330 contracts: Welch's t replays from collected values with
  * the identical pinned IEEE op chain; the recall curve's structural
  * claims hold and the exhaustive rung equals brute force. */
class WelchAndRecallSpec extends SparkSpec {

  test("q329: Welch t replays from collected cents with the pinned op chain") {
    val out = graft.SparkEntry
      .queries("q329_welch_ttest")(spark, sfDir).head()
    val cents = QueryUtil.table(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        floor(col("value") * lit(100d)).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def sums(t: String): (Double, Double, Double) = {
      val xs = cents.filter(_._1 == t).map(_._2)
      (xs.length.toDouble, xs.sum.toDouble,
        xs.map(x => x * x).sum.toDouble)
    }
    val (n1, s1, q1) = sums("click")
    val (n2, s2, q2) = sums("purchase")
    def term(n: Double, s: Double, q: Double): Double =
      ((q - s * s / n) / (n - 1)) / n
    val t1 = term(n1, s1, q1); val t2 = term(n2, s2, q2)
    val t = 1000000d * ((s1 / n1 - s2 / n2) / 100) /
      math.sqrt((t1 + t2) / 10000)
    val df = (t1 + t2) * (t1 + t2) /
      (t1 * t1 / (n1 - 1) + t2 * t2 / (n2 - 1))
    assert(out.getAs[Long]("n1") == n1.toLong)
    assert(out.getAs[Long]("n2") == n2.toLong)
    assert(out.getAs[Long]("t_micro") == math.floor(t).toLong)
    assert(out.getAs[Long]("df_floor") == math.floor(df).toLong)
    // Welch–Satterthwaite df lives between min(n)-1 and n1+n2-2
    val dfl = out.getAs[Long]("df_floor")
    assert(dfl >= math.min(n1, n2).toLong - 1 && dfl <= (n1 + n2).toLong - 2)
    assert(out.getAs[Boolean]("reject_95") ==
      (math.abs(out.getAs[Long]("t_micro")) >= 1960000L))
    // exact integer means replay
    assert(out.getAs[Long]("mean1_micro") ==
      (2 * s1.toLong * 10000 + n1.toLong) / (2 * n1.toLong))
  }

  test("q330: ladder structure holds; exhaustive rung equals brute force") {
    val rows = graft.SparkEntry
      .queries("q330_ann_recall_curve")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      PipelineQueries.RecallProbeLadder.map(_.toLong))
    // probe nesting makes nondecreasing a theorem — it must never trip
    assert(rows.forall(_.getAs[Boolean]("nondecreasing")))
    assert(rows.forall(_.getAs[Boolean]("exact_at_exhaustive")))
    // independent exhaustive check: q25 (IVF, full probing) == q13
    // (brute force) neighbor sets — so recall at the last rung is 1000
    val ivf = graft.SparkEntry.queries("q25_ann_ivf")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = graft.SparkEntry.queries("q13_knn_cosine")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == bf)
  }
}
