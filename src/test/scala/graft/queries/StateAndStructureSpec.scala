package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 third-batch gates: q280 (isotonic fit — driver minimax
  * replay + monotonicity), q281 (transformWithState milestones — batch
  * first-crossing equality + at-most-once), q282 (WL refinement —
  * driver hash replay + refinement monotonicity). */
class StateAndStructureSpec extends SparkSpec {

  test("q280: isotonic fit matches a driver minimax replay and is monotone") {
    val got = PipelineQueries.isotonicCalibration(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val bins = got.map(b => (b._1, b._2, b._3)).toSeq
    // prefix sums over present bins
    val pre = bins.scanLeft((0L, 0L, 0L)) { case ((_, cn, cp), (b, n, p)) =>
      (b, cn + n, cp + p) }.tail
    def mean(j: Int, k: Int): Long = {
      val (nj0, pj0) = (pre(j)._2 - bins(j)._2, pre(j)._3 - bins(j)._3)
      1000L * (pre(k)._3 - pj0) / (pre(k)._2 - nj0)
    }
    bins.indices.foreach { i =>
      val exp = (0 to i).map(j => (i until bins.length)
        .map(k => mean(j, k)).min).max
      assert(got(i)._5 == exp, s"bin ${bins(i)._1}")
      assert(got(i)._4 == 1000L * bins(i)._3 / bins(i)._2)
    }
    // a valid isotonic fit: non-decreasing in the bin order
    assert(got.map(_._5).toSeq == got.map(_._5).sorted.toSeq)
    // the fit actually differs from the raw rates somewhere (PAV pooled)
    assert(got.exists(r => r._4 != r._5),
      "raw rates happen to be isotonic — fixture exercises nothing")
  }

  test("q281: transformWithState milestones equal the batch first-crossings") {
    val got = ScaleQueries.streamMilestones(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      var c = 0L
      rows.sortBy(r => (r._2, r._3)).flatMap { r =>
        val nc = c + r._4
        val hits = ScaleQueries.MilestoneThresholds
          .filter(t => c < t && nc >= t)
          .map(t => (u, t, r._2, r._3, nc))
        c = nc
        hits
      }
    }.sortBy(h => (h._1, h._2))
    assert(got.toSeq == exp)
    // at-most-once per (user, tier); crossing row proves the tier
    assert(got.map(h => (h._1, h._2)).distinct.length == got.length)
    got.foreach(h => assert(h._5 >= h._2))
  }

  test("q282: WL refinement matches a driver hash replay; classes only split") {
    val rows = GraphQueries.wlRefinement(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_._2).distinct.length == 1, "node count conserved")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      "classes can only split")
    // exact driver replay of the recursion
    val arcs = QueryUtil.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
      .join(QueryUtil.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0))))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val nbrs = arcs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var color: Map[Long, String] =
      nbrs.view.mapValues(_.length.toString).toMap
    def stats(c: Map[Long, String]): (Long, Long, Long) = {
      val sz = c.values.groupBy(identity).values.map(_.size.toLong)
      (sz.size.toLong, sz.max, sz.count(_ == 1L).toLong)
    }
    var exp = Vector(stats(color))
    for (_ <- 1 to GraphQueries.WlRounds) {
      color = nbrs.map { case (v, ns) =>
        v -> md5hex(color(v) + ":" + ns.map(color).sorted.mkString(","))
      }
      exp :+= stats(color)
    }
    assert(rows.map(r => (r._3, r._4, r._5)).toSeq == exp)
  }

  test("q285: event-time timer reports equal the batch follow-up windows") {
    val got = ScaleQueries.streamTimers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p = QueryUtil.eventsTsUs(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = p.map { case (u, t) =>
      (u, t, p.count(x => x._1 == u && x._2 > t &&
        x._2 <= t + ScaleQueries.FollowupWindowUs).toLong)
    }.sortBy(x => (x._1, x._2)).toSeq
    assert(got.toSeq == exp,
      "every purchase's timer must fire with the complete window count")
    assert(got.exists(_._3 > 0), "no follow-ups at all — window too narrow")
    assert(got.exists(_._3 == 0), "every purchase followed — window trivial")
  }

  test("q286: neighborhood function — exact reach replay, growth arithmetic, sketch bound") {
    val rows = GraphQueries.neighborhoodFunction(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_._4), "sketch estimate escaped the 5% bound")
    // exact replay via BFS from every backbone node
    val global = GraphQueries.triangleCount(spark, sfDir).collect().head
    assert(rows.head._2 == global.getLong(0), "N(0) = node count")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, "balls can only grow")
      assert(b._3 == 1000L * b._2 / a._2, "growth arithmetic")
      ()
    }
    assert(rows.head._3 == 1000L)
    assert(rows.last._2 <= rows.head._2 * rows.head._2,
      "reach cannot exceed the node-pair universe")
  }

  test("q287: systematic resample conserves slots exactly and matches a replay") {
    val got = CurationQueries.importanceResample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val totW = docs.map(_._3).sum
    val stride = math.max(totW / CurationQueries.ResampleTarget, 1L)
    // telescoping conservation: total copies is exactly floor(W/stride)
    assert(got.map(_._4).sum == totW / stride)
    // driver replay of the stride-crossing rule per source
    var cum = 0L
    val copies = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    docs.foreach { case (_, src, w) =>
      val c0 = cum / stride; cum += w
      copies(src) += cum / stride - c0
    }
    got.foreach { case (src, n, toks, cps, share) =>
      assert(cps == copies(src), s"$src copies")
      assert(n == docs.count(_._2 == src))
      assert(toks == docs.filter(_._2 == src).map(_._3).sum)
      assert(share == 1000L * cps / (totW / stride))
    }
  }

  test("q288: Markov attribution — independent journey replay and fixpoint") {
    val got = ScaleQueries.markovAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // fixpoint: one more iteration changes nothing
    val more = ScaleQueries.markovAttributionIters(spark, sfDir, ScaleQueries.MarkovIters + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == more.toSeq, "power iteration not converged")
    // independent replay from raw events
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      val cut = ordered.indexOf("purchase")
      val seq0 = (if (cut >= 0) ordered.take(cut + 1) else ordered)
        .map(t => if (t == "purchase") "conv" else t)
      val states = (Seq("start") ++ seq0) ++
        (if (cut >= 0) Nil else Seq("null"))
      states.sliding(2).foreach {
        case Seq(a, b) => trans((a, b)) = trans((a, b)) + 1
        case _ => ()
      }
    }
    val outMass = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val t = trans.map { case ((f, to), c) =>
      (f, to) -> 1000L * c / outMass(f) }.toMap
    val channels = trans.keys.map(_._1).filter(_ != "start").toSeq
      .distinct.sorted
    def conv(excl: Option[String]): Long = {
      val keep = t.filter { case ((f, to), _) =>
        !excl.contains(f) && !excl.contains(to) }
      val sts = ("start" +: channels).filterNot(excl.contains)
      var p = sts.map(_ -> 0L).toMap
      for (_ <- 1 to ScaleQueries.MarkovIters) {
        p = sts.map { s =>
          s -> ((sts.map(c => keep.getOrElse((s, c), 0L) * p(c)).sum +
            keep.getOrElse((s, "conv"), 0L) * 1000L) / 1000L)
        }.toMap
      }
      p("start")
    }
    val pFull = conv(None)
    val exp = channels.map { c =>
      val pRem = conv(Some(c))
      (c, pFull, pRem, 1000L - 1000L * pRem / math.max(pFull, 1L))
    }
    val effSum = math.max(exp.map(_._4).sum, 1L)
    assert(got.toSeq == exp.map(e =>
      (e._1, e._2, e._3, e._4, 1000L * e._4 / effSum)).toSeq)
    got.foreach { g =>
      assert(g._3 <= g._2, "removing a channel cannot raise conversion")
      assert(g._4 >= 0 && g._4 <= 1000)
    }
    assert(got.map(_._5).sum <= 1000,
      "normalized attribution shares must not exceed the whole")
  }

  test("q289: CSV quarantine catches exactly the planted corruption") {
    val r = CleaningQueries.csvIngest(spark, sfDir).collect().head
    val orders = QueryUtil.table(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val bad = orders.filter(_._1 % 97 == 0)
    assert(r.getLong(0) == orders.length)
    assert(r.getLong(1) == bad.length)
    assert(bad.nonEmpty, "fixture must plant at least one corrupt row")
    assert(r.getLong(2) == 1000L * bad.length / orders.length)
    assert(r.getLong(3) == orders.filter(_._1 % 97 != 0).map(_._2).sum,
      "good revenue must exclude quarantined rows exactly")
    assert(r.getLong(4) == bad.map(_._1).sum,
      "quarantined keys must stay auditable through the corrupt record")
  }

  test("q290: Stouffer combination matches a brute-force per-stratum replay") {
    val r = QualityQueries.stoufferCombined(spark, sfDir).collect().head
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("source"), (col("lang") === "en"),
        lower(trim(col("text")))).collect()
      .map { x =>
        val w = x.getString(2).split("\\s+")
        (x.getString(0), x.getBoolean(1), 1000L * w.distinct.length / w.length)
      }
    val strata = docs.groupBy(_._1).filter { case (_, ds) =>
      ds.exists(_._2) && ds.exists(!_._2) }
    val zs = strata.toSeq.sortBy(_._1).map { case (_, ds) =>
      val a = ds.filter(_._2).map(_._3)
      val b = ds.filterNot(_._2).map(_._3)
      val u2 = (for (x <- a; y <- b) yield
        (if (x > y) 2L else if (x == y) 1L else 0L)).sum
      val na = a.length.toLong; val nb = b.length.toLong
      val sd = math.max(math.floor(math.sqrt(
        (na * nb * (na + nb + 1)).toDouble / 3.0)).toLong, 1L)
      1000L * (u2 - na * nb) / sd
    }
    assert(r.getLong(0) == strata.size)
    assert(r.getLong(1) == strata.values.map(_.length).sum)
    assert(r.getLong(2) == zs.sum)
    val den = math.floor(math.sqrt(1000000.0 * strata.size)).toLong
    val sz = zs.sum
    val expZ = if (sz >= 0) 1000L * sz / den else -((1000L * -sz) / den)
    assert(r.getLong(3) == expZ)
    assert(r.getBoolean(4) == (math.abs(expZ) > QualityQueries.StoufferCritMilli))
  }

  test("q291: greedy matching matches a driver replay and is maximal") {
    val rows = GraphQueries.greedyMatching(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to GraphQueries.MatchRounds).toSeq)
    // driver replay of mutual-min proposal rounds on the same backbone
    val ui = QueryUtil.table(spark, sfDir, "events")
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("item"))
      .filter(col("item") =!= "")
      .select(col("user_id"), col("item").cast("long").as("item"))
      .distinct()
    val e = ui.as("a")
      .join(ui.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("a"), col("b.item").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(GraphQueries.TriEdges)
      .select("a", "b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).distinct
    val nbrs = e.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    var un = nbrs.keySet
    val n = un.size.toLong
    var cum = 0L
    val exp = (1 to GraphQueries.MatchRounds).map { r =>
      val cand = un.iterator.flatMap { v =>
        nbrs(v).find(un.contains).map(v -> _) }.toMap
      val mutual = cand.filter { case (v, c) =>
        cand.get(c).contains(v) && v < c }
      cum += mutual.size
      un = un -- mutual.keySet -- mutual.values
      (r.toLong, mutual.size.toLong, cum, n - 2 * cum)
    }
    assert(rows.toSeq == exp)
    // maximality: no edge joins two unmatched nodes
    assert(!e.exists { case (a, b) => un.contains(a) && un.contains(b) },
      "matching not maximal after the configured rounds")
    assert(cum > 0, "the backbone must admit at least one matched pair")
  }

  test("q292: graph store serves at rest and equals q282's final round") {
    // build (or reuse) the store, then check the SERVING plan reads
    // the store alone — zero events scans (the q184/q217 discipline)
    GraphQueries.ensureGraphStore(spark, sfDir)
    val df = GraphQueries.graphStore(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("orders.parquet") &&
      !plan.contains("lineitem.parquet"),
      s"serving plan must not rescan the base tables:\n$plan")
    assert(plan.contains("graft_graph_store_"),
      s"serving plan must read the store:\n$plan")
    val r = df.collect().head
    // recompute equivalence with q282's final refinement round
    val wl = GraphQueries.wlRefinement(spark, sfDir).collect()
      .find(_.getLong(0) == GraphQueries.WlRounds.toLong).get
    assert(r.getLong(0) == wl.getLong(1), "n_nodes")
    assert(r.getLong(1) == wl.getLong(2), "n_classes")
    assert(r.getLong(2) == wl.getLong(3), "max_class_size")
    assert(r.getLong(3) == wl.getLong(4), "n_singletons")
    // edge-side arithmetic
    assert(r.getLong(4) > 0 && r.getLong(5) <= r.getLong(4))
    assert(r.getLong(6) == 1000L * r.getLong(5) / r.getLong(4))
  }

  test("q283: local clustering matches a driver replay and recomposes q116") {
    val got = GraphQueries.localClustering(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // same backbone, rebuilt via q116's own published totals
    val global = GraphQueries.triangleCount(spark, sfDir).collect().head
    assert(got.map(_._3).sum == 3 * global.getLong(2),
      "corner credits must recompose 3x the global triangle count")
    assert(got.map(_._2).sum == 2 * global.getLong(1),
      "degree mass must be twice the edge count")
    assert(got.length == global.getLong(0), "one row per backbone node")
    got.foreach { case (v, d, t, cc) =>
      assert(t <= d * (d - 1) / 2, s"node $v exceeds its wedge budget")
      assert(cc == (if (d >= 2) 2000L * t / (d * (d - 1)) else 0L))
      assert(cc >= 0 && cc <= 1000)
    }
  }

  test("q284: feature selection matches a driver MI replay; dead feature scores zero") {
    val got = QualityQueries.featureSelection(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.map(_._5).toSeq == Seq(1, 2, 3, 4))
    assert(got.find(_._1 == "sym_bin").get._2 == 0L,
      "the constant feature must carry exactly zero information")
    // driver replay of the stop_bin MI in the q239 micronat contract
    val stop = graft.text.TextStats.stopwords.toSet
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("lang"), lower(trim(col("text")))).collect()
      .map(r => (r.getString(0) == "en", r.getString(1).split("\\s+")))
    val n = docs.length.toLong
    val cells = docs.map { case (y, w) =>
      val bin = math.min(1000L * w.count(stop) / w.length / 100, 9L)
      (bin, y)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cm = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val minum = cells.map { case ((b, y), o) =>
      o * math.round(1e6 * (math.log(o.toDouble * n) -
        math.log(rm(b).toDouble * cm(y))))
    }.sum
    val expMi = if (minum >= 0) minum / n else -((-minum) / n)
    assert(got.find(_._1 == "stop_bin").get._2 == expMi)
    val hLabel = cm.values.map(r =>
      r * math.round(1e6 * (math.log(n.toDouble) - math.log(r.toDouble)))
    ).sum / n
    got.foreach { g =>
      assert(g._3 == hLabel)
      val expIg = if (g._2 >= 0) 1000L * g._2 / hLabel
        else -((1000L * -g._2) / hLabel)
      assert(g._4 == expIg)
    }
  }
}
