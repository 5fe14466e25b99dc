package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q112 (join-size sketch), q113 (Gopher rules), q114 (co-occurrence
  * lift) — property checks beyond the hash-exact oracle gate. */
class GraphAndSketchSpec extends SparkSpec {

  test("q112: sketch over-estimates, bound holds, exact side is the true join size") {
    val r = ScaleQueries.joinSizeSketch(spark, sfDir).collect().head
    val (nEv, nUsers, exact, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(4), "CMS inner product must never under-estimate")
    assert(r.getBoolean(5), "min-row estimate outside the eps*N^2 bound")
    // the gate's exact side really is |events self-join on user_id|
    val ev = QueryUtil.table(spark, sfDir, "events").select("user_id")
    val trueSize = ev.as("a").join(ev.as("b"), "user_id").count()
    assert(exact == trueSize)
    assert(nEv == ev.count() && nUsers == ev.distinct().count())
    // err_pm consistent with the reported columns
    assert(r.getLong(6) == 1000L * (est - exact) / exact)
  }

  test("q112: estimate is deterministic across partitionings of the input") {
    val a = ScaleQueries.joinSizeSketch(spark, sfDir).collect().head
    val b = ScaleQueries.joinSizeSketch(spark, sfDir).collect().head
    assert(a == b)
  }

  test("q113: rule accounting — any >= each rule, <= sum; at least two rules fire") {
    val rows = CleaningQueries.gopherRules(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("word_count", "mean_word_len", "symbol_ratio",
      "alpha_words", "stopwords", "any"))
    val nDocs = rows("any")._2
    assert(rows.values.forall(_._2 == nDocs))
    val ruleCounts = (rows - "any").values.map(_._1)
    val any = rows("any")._1
    assert(any >= ruleCounts.max && any <= ruleCounts.sum)
    assert(ruleCounts.count(_ > 0) >= 2, "suite should discriminate on this corpus")
    rows.foreach { case (rule, (f, n, pm)) =>
      assert(pm == 1000L * f / n, rule)
    }
  }

  test("q113: the stopword rule passes English-like docs and fails others") {
    // all-English fixture rows pass; stopword-free rows fail
    import spark.implicits._
    val fx = Seq(
      (1L, "the cat sat on a mat and that was that be it"),
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      .toDF("doc_id", "text")
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val nStop = CleaningQueries.GopherStopwords.map(w =>
      when(instr(padded, s" $w ") > 0, 1L).otherwise(0L)).reduce(_ + _)
    val got = fx.select(col("doc_id"), (nStop >= 2L).as("pass"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && !got(2L))
  }

  test("q115: output is exactly the true heavy set with both guarantees pinned") {
    val rows = ScaleQueries.heavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getLong(2)
    val thr = rows.head.getLong(3)
    assert(thr == n / ScaleQueries.MgK)
    rows.foreach { r =>
      assert(r.getLong(1) > thr, r.getString(0))
      assert(r.getBoolean(4) && r.getBoolean(5), r.getString(0))
    }
    // the heavy set equals an exact recount over the same key
    val exact = QueryUtil.table(spark, sfDir, "events")
      .select(ScaleQueries.mgKey.as("hkey"))
      .groupBy("hkey").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet ==
      exact.filter(_._2 > thr).keySet)
  }

  test("q116: triangle count matches a driver-side recount of the backbone") {
    val r = GraphQueries.triangleCount(spark, sfDir).collect().head
    val (nNodes, nEdges, nTri, wedges, cc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nEdges <= GraphQueries.TriEdges && nTri > 0)
    assert(cc == 3000L * nTri / wedges && cc <= 1000L)
    // rebuild the deterministic backbone and recount triangles in Scala
    val ui = QueryUtil.table(spark, sfDir, "events")
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("item"))
      .distinct()
    val support = ui.as("a").join(ui.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("a"), col("b.item").as("b")).count()
      .collect().map(r2 => ((r2.getLong(0), r2.getLong(1)), r2.getLong(2)))
    val edges = support.sortBy { case ((a, b), n) => (-n, a, b) }
      .take(GraphQueries.TriEdges).map(_._1).toSet
    assert(edges.size == nEdges)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tri = edges.iterator.map { case (a, b) =>
      adj.getOrElse(b, Set.empty[Long]).count(c => edges.contains((a, c)))
    }.sum
    assert(tri.toLong == nTri)
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).values.map(_.size.toLong)
    assert(deg.map(d => d * (d - 1) / 2).sum == wedges)
    assert(deg.size.toLong == nNodes)
  }

  test("q254: degree assortativity matches a driver replay over the same backbone") {
    val r = GraphQueries.degreeAssortativity(spark, sfDir).collect().head
    val (nE, m, sx, sxx, sxy, rm) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val ui = QueryUtil.table(spark, sfDir, "events")
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("item"))
      .distinct()
    val support = ui.as("a").join(ui.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("a"), col("b.item").as("b")).count()
      .collect().map(r2 => ((r2.getLong(0), r2.getLong(1)), r2.getLong(2)))
    val edges = support.sortBy { case ((a, b), n) => (-n, a, b) }
      .take(GraphQueries.TriEdges).map(_._1)
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pts = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    assert(nE == edges.length.toLong && m == 2L * edges.length)
    assert(sx == pts.map(_._1).sum)
    assert(sxx == pts.map(p => p._1 * p._1).sum)
    assert(sxy == pts.map(p => p._1 * p._2).sum)
    val num = m * sxy - sx * sx
    val den = math.max(m * sxx - sx * sx, 1L)
    assert(rm == (if (num >= 0) 1000L * num / den else -(1000L * (-num) / den)))
    // a valid correlation, and the symmetrized marginals really coincide
    assert(math.abs(rm) <= 1000L)
    assert(pts.map(_._1).sum == pts.map(_._2).sum)
  }

  test("q118: streaming MG state reproduces the batch heavy-hitter report exactly") {
    val batch = ScaleQueries.heavyHitters(spark, sfDir).collect().toSeq
    val stream = ScaleQueries.streamHeavyHitters(spark, sfDir).collect().toSeq
    assert(stream == batch)
  }

  test("q119: filtered search returns k same-label rows per query, equal to brute force") {
    val rows = PipelineQueries.annFiltered(spark, sfDir).collect()
    val queries = QueryUtil.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < PipelineQueries.KnnQueries)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exactly k rows per query (pre-filtering keeps k guaranteed)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == queries.keySet)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == PipelineQueries.KnnK, s"query $q")
      rs.foreach(r => assert(r.getInt(3) == queries(q), s"label mismatch $r"))
    }
    // equals the label-restricted brute force (cosine recomputed here)
    val vecs = QueryUtil.table(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    queries.foreach { case (q, lbl) =>
      val qv = vecs.find(_._1 == q).get._2
      val expect = vecs
        .filter(v => v._3 == lbl && v._1 != q)
        .map(v => (v._1, cos(qv, v._2)))
        .sortBy { case (id, c) => (-c, id) }
        .take(PipelineQueries.KnnK).map(_._1).toSeq
      val got = byQuery(q).sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(got == expect, s"query $q")
    }
  }

  test("q121: pair accounting per label — totals, disjoint classes, checksums") {
    val rows = PipelineQueries.contrastivePairs(spark, sfDir).collect()
    val sizes = QueryUtil.table(spark, sfDir, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getInt(0)).toSet == sizes.keySet)
    var pos = 0L; var neg = 0L
    rows.foreach { r =>
      val n = sizes(r.getInt(0))
      assert(r.getLong(1) == n * (n - 1) / 2, s"label ${r.getInt(0)}")
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1))
      pos += r.getLong(2); neg += r.getLong(3)
    }
    // the mined classes are non-degenerate on this corpus
    assert(pos > 0 && neg > 0)
  }

  test("q122: rank transform spans [0, 1000] with the exact rank-sum per type") {
    val rows = ExtendedQueries.rankNormalize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == 0L && r.getLong(3) == 1000L)
      // sum over r of (1000*(r-1)) div (n-1) — recompute exactly
      val expect = (1L to n).map(k => 1000L * (k - 1) / (n - 1)).sum
      assert(r.getLong(4) == expect, r.getString(0))
    }
  }

  test("q114: lift is exact integer math over true distinct-user counts") {
    val rows = GraphQueries.itemCooccurrence(spark, sfDir).collect()
    assert(rows.length == GraphQueries.CoocTopK)
    val ev = QueryUtil.table(spark, sfDir, "events")
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("item"))
      .distinct()
    val nUsers = ev.select("user_id").distinct().count()
    val byItem = ev.groupBy("item").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, nab, na, nb, lift) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b)
      assert(na == byItem(a) && nb == byItem(b))
      assert(nab <= math.min(na, nb))
      assert(lift == 1000L * nab * nUsers / (na * nb))
    }
    // descending support with the (a, b) tiebreak
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getLong(2) > y.getLong(2) ||
          (x.getLong(2) == y.getLong(2) &&
            (x.getLong(0) < y.getLong(0) ||
              (x.getLong(0) == y.getLong(0) && x.getLong(1) < y.getLong(1)))))
      case _ =>
    }
  }

  test("q128: exact Jaccard and KMV estimate re-derive from driver-side shingle sets") {
    val r = PipelineQueries.corpusOverlap(spark, sfDir).collect().head
    val (na, nb, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val w = PipelineQueries.KmvW
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def shingles(t: String): Seq[Long] = {
      val a = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (a.length < w) Seq.empty
      else (0 to a.length - w).map(i => h60(a.slice(i, i + w).mkString(" ")))
    }
    val setA = docs.filter(_._1 % 3 != 2).flatMap(d => shingles(d._2)).toSet
    val setB = docs.filter(_._1 % 2 == 0).flatMap(d => shingles(d._2)).toSet
    assert(na == setA.size && nb == setB.size && nc == (setA & setB).size)
    val k = PipelineQueries.KmvK
    val ka = setA.toSeq.sorted.take(k).toSet
    val kb = setB.toSeq.sorted.take(k).toSet
    val ku = (ka ++ kb).toSeq.sorted.take(k)
    val m = ku.count(h => ka.contains(h) && kb.contains(h)).toLong
    assert(r.getLong(4) == m)
    assert(r.getLong(5) == 1000L * m / k)
    // KMV merge property: bottom-k of the union set == bottom-k of the
    // merged sketches — the mergeability the dataset card relies on
    assert(ku == (setA ++ setB).toSeq.sorted.take(k))
    assert(r.getBoolean(7), s"estimator err ${r.getLong(6)}‰ above bound")
  }

  test("q142: long-chain components match closed form; star rounds stay O(log n)") {
    // sf0.001 has 1000 dense ids → ceil(1000/256) = 4 path components
    // (three full 256-hop blocks + a 232-node tail), each a chain whose
    // diameter min-label propagation would need one round per hop for;
    // rounds_logn_ok carries the star-contraction bound.
    val rows = GraphQueries.chainComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 256L), (256L, 256L), (512L, 256L), (768L, 232L)))
    assert(rows.forall(_._3), "star contraction exceeded the O(log n) round bound")
  }

  test("q171: hit@k protocol equals a driver-side replay of the whole eval") {
    import GraphQueries.RecCutoffUs
    val r = GraphQueries.recEval(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.col("props"), "\"k\": (\\d+)", 1)
          .as("item"),
        org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_id"))
      .collect()
      .filter(_.getString(1).nonEmpty)
      .map(x => (x.getLong(0), x.getString(1).toLong, x.getLong(2), x.getLong(3)))
    val train = ev.filter(_._3 < RecCutoffUs).map(e => (e._1, e._2)).distinct
    val hist = train.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val co = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    hist.values.foreach { items =>
      for (a <- items; b <- items if a != b)
        co((a, b)) = co.getOrElse((a, b), 0L) + 1
    }
    val targets = ev.filter(e => e._3 >= RecCutoffUs &&
        !hist.getOrElse(e._1, Set.empty).contains(e._2))
      .groupBy(_._1).view.mapValues(_.minBy(e => (e._3, e._4))._2).toMap
    var (h1, h5, h10) = (0L, 0L, 0L)
    targets.foreach { case (u, tgt) =>
      val hs = hist.getOrElse(u, Set.empty)
      val scores = scala.collection.mutable.HashMap.empty[Long, Long]
      hs.foreach(i => co.keys.filter(_._1 == i).foreach { case (_, j) =>
        if (!hs.contains(j)) scores(j) = scores.getOrElse(j, 0L) + co((i, j))
      })
      val top = scores.toSeq.sortBy { case (j, sc) => (-sc, j) }.take(10).map(_._1)
      if (top.take(1).contains(tgt)) h1 += 1
      if (top.take(5).contains(tgt)) h5 += 1
      if (top.contains(tgt)) h10 += 1
    }
    val want = (targets.size.toLong, h1, h5, h10,
      1000L * h10 / targets.size)
    assert(got == want)
    // the protocol is live: some test users exist, hits are monotone
    assert(got._1 > 0 && got._2 <= got._3 && got._3 <= got._4 && got._4 <= got._1)
  }

  test("q234: brand triples equal a driver-side count; Apriori property holds") {
    val bk = QueryUtil.table(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brands = QueryUtil.table(spark, sfDir, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = bk.map { case (o, p) => (o, brands(p)) }.distinct
      .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).distinct.sorted }
    val n = baskets.size.toLong
    val triples = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    baskets.values.foreach { bs =>
      for (i <- bs.indices; j <- (i + 1) until bs.size) {
        pairs((bs(i), bs(j))) = pairs.getOrElse((bs(i), bs(j)), 0L) + 1
        for (k <- (j + 1) until bs.size) {
          val key = (bs(i), bs(j), bs(k))
          triples(key) = triples.getOrElse(key, 0L) + 1
        }
      }
    }
    val want = triples.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }
      .take(GraphQueries.TripleTopK)
      .map { case ((a, b, c), s) => (a, b, c, s, 1000L * s / n) }
    val got = GraphQueries.brandTriples(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // Apriori anti-monotonicity: every sub-pair supports >= the triple
    got.foreach { case (a, b, c, s, _) =>
      assert(pairs((a, b)) >= s && pairs((a, c)) >= s && pairs((b, c)) >= s)
    }
  }
}
