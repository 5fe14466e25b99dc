package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 batch gates beyond the hash-exact oracle: q267 (stream
  * outer join ≡ batch left join + real null-padding), q268 (HITS —
  * driver integer replay on the collected graph), q269 (Friedman —
  * driver formula replay), q270 (modularity bounds/conservation),
  * q271 (zone-map audit internal consistency + the sorted-beats-hash
  * claim), q272 (feed mirror — driver set replay), q273 (Jonckheere —
  * driver replay), q274 (k-means — membership/purity structure +
  * determinism). */
class TrendAndStructureSpec extends SparkSpec {

  test("q267: stream outer join ≡ batch LEFT join, with real null-padded rows") {
    val got = ScaleQueries.streamOuterJoin(spark, sfDir).collect()
    // batch expected, built independently of the streaming machinery
    val ev = QueryUtil.table(spark, sfDir, "events")
    val ts = QueryUtil.eventTsUs(ev)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), ts.as("purchase_ts_us"), col("event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), ts.as("click_ts_us"),
        col("value").as("click_value"))
    val exp = p.join(c,
        col("user_id") === col("cu") &&
          col("click_ts_us") > col("purchase_ts_us") - ScaleQueries.RangeWindowUs &&
          col("click_ts_us") <= col("purchase_ts_us"),
        "left")
      .select("user_id", "purchase_ts_us", "event_id", "click_ts_us",
        "click_value")
      .orderBy(col("user_id"), col("purchase_ts_us"),
        col("click_ts_us").asc_nulls_first)
      .collect()
    assert(got.length == exp.length)
    assert(got.toSeq == exp.toSeq)
    assert(got.exists(_.isNullAt(3)),
      "no null-padded row — outer semantics unexercised at this SF")
  }

  test("q268: HITS matches a driver integer replay of the collected graph") {
    val arcs = QueryUtil.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
      .join(QueryUtil.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("src"),
        (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val scale = graft.operators.Hits.Scale
    val dsts = arcs.map(_._2).distinct.sorted
    var a = dsts.map(d => d -> scale / dsts.length).toMap
    var h = Map.empty[Long, Long]
    for (_ <- 1 to GraphQueries.HitsRounds) {
      val hRaw = arcs.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => a(e._2)).sum }
      val hTot = math.max(hRaw.values.sum, 1L)
      h = hRaw.map { case (k, v) => k -> (scale * v) / hTot }
      val aRaw = arcs.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1)).sum }
      val aTot = math.max(aRaw.values.sum, 1L)
      a = aRaw.map { case (k, v) => k -> (scale * v) / aTot }
    }
    def label(n: Long) = (if (n % 2 == 0) "C" else "S") + (n / 2)
    val expHubs = h.toSeq.map { case (n, s) => (label(n), s) }
      .sortBy { case (n, s) => (-s, n) }.take(GraphQueries.HitsTopK)
    val expAuth = a.toSeq.map { case (n, s) => (label(n), s) }
      .sortBy { case (n, s) => (-s, n) }.take(GraphQueries.HitsTopK)
    val got = GraphQueries.hitsRanking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val gotHubs = got.filter(_._2 == "hub").map(r => (r._1, r._3)).toSeq
    val gotAuth = got.filter(_._2 == "authority").map(r => (r._1, r._3)).toSeq
    assert(gotHubs == expHubs)
    assert(gotAuth == expAuth)
    assert(gotHubs.forall(_._1.startsWith("C")), "hubs must be customers")
    assert(gotAuth.forall(_._1.startsWith("S")), "authorities must be suppliers")
  }

  test("q269: Friedman statistic matches a driver replay; blocks complete") {
    val r = QualityQueries.friedmanTest(spark, sfDir).collect().head
    val k = QualityQueries.FriedmanTypes.size.toLong
    val ev = QueryUtil.table(spark, sfDir, "events")
    val counts = ev
      .filter(col("event_type").isin(QualityQueries.FriedmanTypes: _*))
      .select(to_date(QueryUtil.eventTs(ev)).as("d"), col("event_type"))
      .groupBy("d", "event_type").count().collect()
      .map(x => (x.get(0).toString, x.getString(1)) -> x.getLong(2)).toMap
    val days = counts.keys.map(_._1).toSeq.distinct
    val n = days.length.toLong
    assert(r.getLong(0) == n)
    // doubled average ranks per day
    var rs = Map.empty[String, Long].withDefaultValue(0L)
    var tieTerm = 0L
    days.foreach { d =>
      val vals = QualityQueries.FriedmanTypes
        .map(t => t -> counts.getOrElse((d, t), 0L))
      vals.groupBy(_._2).foreach { case (_, g) =>
        val t = g.length.toLong; tieTerm += t * t * t - t }
      vals.foreach { case (ty, v) =>
        val less = vals.count(_._2 < v).toLong
        val ties = vals.count(_._2 == v).toLong
        rs = rs.updated(ty, rs(ty) + 2 * less + ties + 1)
      }
    }
    QualityQueries.FriedmanTypes.zipWithIndex.foreach { case (t, i) =>
      assert(r.getLong(1 + i) == rs(t), s"rank sum $t")
    }
    assert(r.getLong(4) == tieTerm)
    val s2 = QualityQueries.FriedmanTypes.map(t => rs(t) * rs(t)).sum
    val chiM = (3000 * s2 - 3000 * n * n * k * (k + 1) * (k + 1)) /
      (n * k * (k + 1))
    assert(r.getLong(5) == chiM)
    // doubled ranks per block sum to k(k+1)
    assert(QualityQueries.FriedmanTypes.map(rs).sum == n * k * (k + 1))
  }

  test("q293: Page's L matches a driver replay; consistent with q269's ranks") {
    val r = QualityQueries.pageTrend(spark, sfDir).collect().head
    val k = QualityQueries.PageOrder.size.toLong
    val ev = QueryUtil.table(spark, sfDir, "events")
    val counts = ev
      .filter(col("event_type").isin(QualityQueries.PageOrder: _*))
      .select(to_date(QueryUtil.eventTs(ev)).as("d"), col("event_type"))
      .groupBy("d", "event_type").count().collect()
      .map(x => (x.get(0).toString, x.getString(1)) -> x.getLong(2)).toMap
    val days = counts.keys.map(_._1).toSeq.distinct
    val n = days.length.toLong
    var l2 = 0L
    days.foreach { d =>
      val vals = QualityQueries.PageOrder
        .map(t => t -> counts.getOrElse((d, t), 0L))
      vals.zipWithIndex.foreach { case ((_, v), j) =>
        val less = vals.count(_._2 < v).toLong
        val ties = vals.count(_._2 == v).toLong
        l2 += (j + 1) * (2 * less + ties + 1)
      }
    }
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == l2)
    val mean2 = n * k * (k + 1) * (k + 1) / 2
    assert(r.getLong(2) == mean2)
    assert(r.getString(3) == (if (l2 > mean2) "with_order"
      else if (l2 < mean2) "against_order" else "none"))
    assert(r.getBoolean(4) ==
      (36000L * (l2 - mean2) * (l2 - mean2) >
        3842L * n * k * k * (k + 1) * (k + 1) * (k - 1)))
  }

  test("q270: modularity bounds and edge conservation against q10") {
    val rows = ScaleQueries.dedupModularity(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("component", "source"))
    val (mC, _, weC, qC) = rows("component")
    val (mS, _, weS, qS) = rows("source")
    assert(mC == mS, "both schemes audit the same edge set")
    assert(weC == mC, "components contain every edge by construction")
    assert(weS <= mS)
    assert(qC <= 1000000L && qS <= 1000000L)
    assert(qS <= qC, "no partition beats the components on their own graph")
    val nPairs = PipelineQueries.dedupMinhash(spark, sfDir).count()
    assert(mC == nPairs, "edge count must be q10's pair count")
  }

  test("q271: zone-map audit internal consistency; sorted layout wins") {
    val rows = ScaleQueries.zonemapAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("sorted", "hash"))
    val total = QueryUtil.table(spark, sfDir, "lineitem").count()
    rows.values.foreach { r =>
      assert(r.getLong(4) == total, "rows_total conservation")
      assert(r.getLong(2) <= r.getLong(1), "skipped <= zones")
      assert(r.getLong(3) <= total)
      assert(r.getLong(5) == 1000L * r.getLong(2) / r.getLong(1))
      assert(r.getLong(6) == 1000L * r.getLong(3) / total)
    }
    val sorted = rows("sorted"); val hash = rows("hash")
    assert(sorted.getLong(2) > hash.getLong(2),
      "time-sorted zones must skip strictly more than hash placement")
    assert(sorted.getLong(5) >= 900L,
      "a ~90-day slice of a multi-year span should skip >90% of sorted zones")
  }

  test("q272: feed mirror pairs match a driver set replay; planted mirror flagged") {
    val raw = QueryUtil.table(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val docs = raw ++ raw.filter(_._1 == "src1")
      .map { case (_, t) => ("zz_mirror", t) }
    def shingles(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      if (w.length < ScaleQueries.MirrorShingleK) Set.empty
      else w.sliding(ScaleQueries.MirrorShingleK).map(_.mkString(" ")).toSet
    }
    val profile = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.map(d => shingles(d._2)).reduce(_ ++ _) }
    val sources = profile.keys.toSeq.sorted
    val got = ScaleQueries.sourceMirror(spark, sfDir).collect()
    assert(got.length == sources.length * (sources.length - 1) / 2,
      "complete pair grid expected")
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (pa, pb) = (profile(a), profile(b))
      assert(r.getLong(2) == pa.size && r.getLong(3) == pb.size)
      val inter = (pa & pb).size.toLong
      assert(r.getLong(4) == inter, s"$a x $b intersection")
      assert(r.getLong(5) == 1000L * inter / (pa.size + pb.size - inter))
      assert(r.getLong(6) == 1000L * inter / math.min(pa.size, pb.size))
    }
    // the suspect flag discriminates: exactly the planted re-host fires
    val flagged = got.filter(_.getBoolean(7))
      .map(r => (r.getString(0), r.getString(1)))
    assert(flagged.toSeq == Seq(("src1", "zz_mirror")),
      s"flag must fire on the planted mirror alone, got ${flagged.toSeq}")
    val planted = got.find(r =>
      r.getString(0) == "src1" && r.getString(1) == "zz_mirror").get
    assert(planted.getLong(6) == 1000L, "identical set => containment 1000")
  }

  test("q273: Jonckheere statistic matches a driver replay; trend is real") {
    val r = QualityQueries.jonckheereTrend(spark, sfDir).collect().head
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("n_chars"), lower(trim(col("text"))).as("t")).collect()
      .map { x =>
        val w = x.getString(1).split("\\s+")
        val g = 1L + QualityQueries.JtBinEdges.count(x.getLong(0) >= _)
        (g, 1000L * w.distinct.length / w.length)
      }
    val groups = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gs = groups.keys.toSeq.sorted
    var jt2 = 0L
    for (i <- gs; j <- gs if i < j; x <- groups(i); y <- groups(j)) {
      if (y > x) jt2 += 2 else if (y == x) jt2 += 1
    }
    val n = docs.length.toLong
    val mean2 = (for (i <- gs; j <- gs if i < j)
      yield groups(i).length.toLong * groups(j).length).sum
    val v72 = n * n * (2 * n + 3) -
      gs.map { g => val m = groups(g).length.toLong; m * m * (2 * m + 3) }.sum
    assert(r.getLong(0) == n)
    assert(r.getLong(2) == jt2)
    assert(r.getLong(3) == mean2)
    assert(r.getLong(4) == v72)
    assert(r.getString(5) == (if (jt2 > mean2) "increasing"
      else if (jt2 < mean2) "decreasing" else "none"))
    assert(r.getBoolean(6) ==
      (18000L * (jt2 - mean2) * (jt2 - mean2) > QualityQueries.JtZ2Milli * v72))
  }

  test("q274: k-means membership, purity bounds, seeds own the ids, deterministic") {
    val rows = ScaleQueries.kmeansMicro(spark, sfDir).collect()
    val emb = QueryUtil.table(spark, sfDir, "embeddings")
    val nVecs = emb.count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "every vector assigned once")
    assert(rows.length <= ScaleQueries.KmClusters)
    val seedIds = emb.select("vec_id").orderBy("vec_id")
      .limit(ScaleQueries.KmClusters).collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(seedIds.contains(r.getLong(0)), "cids are seed vec_ids")
      assert(r.getLong(5) >= 1000L / 10 - 1 && r.getLong(5) <= 1000L,
        "purity is a per-mille share")
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1), "mean_d2 arithmetic")
      assert(r.getLong(2) >= 0L)
    }
    val again = ScaleQueries.kmeansMicro(spark, sfDir).collect()
    assert(rows.toSeq == again.toSeq, "bit-deterministic across runs")
  }
}
