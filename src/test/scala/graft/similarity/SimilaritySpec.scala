package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Similarity search vs naive in-driver ground truth on sf0.001. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private def naiveTopK(k: Int, nQueries: Int): Map[Long, Seq[Long]] = {
    val vs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    vs.filter(_._1 < nQueries).map { case (q, qv) =>
      q -> vs.filter(_._1 != q)
        .map { case (n, nv) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("brute-force topK matches naive computation") {
    val got = CosineKnn.topK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), 5)
      .orderBy("query_id", "rank").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq)
      .toMap
    assert(got == naiveTopK(5, 8))
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val rows = CosineKnn.nearDuplicatePairs(emb, "vec_id", "embedding", 0.4).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getAs[Double]("cos") >= 0.4)
    }
  }

  test("IVF search recall >= 0.6 vs exact, and exact on probed cells") {
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nlist = 8)
    assert(centroids.length == 8)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
    // every vector lands in exactly one cell
    assert(assigned.count() == emb.count())
    val got = IvfIndex.search(assigned, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), centroids, 5, nprobe = 4)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet)
      .toMap
    val exact = naiveTopK(5, 8).view.mapValues(_.toSet).toMap
    val recalls = exact.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean IVF recall $mean")
  }

  test("IVF candidates->verify equals exact near-dup pairs (recall 1.0 at q24 config)") {
    val exact = CosineKnn.nearDuplicatePairs(emb, "vec_id", "embedding", 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = IvfIndex.train(emb, "vec_id", "embedding",
      nlist = graft.queries.PipelineQueries.NearDupNlist)
    val cands = IvfIndex.nearDupCandidates(emb, "vec_id", "embedding",
      centroids, nprobe = graft.queries.PipelineQueries.NearDupProbe)
    val verified = CosineKnn.verifyPairs(cands, emb, "vec_id", "embedding", 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exact, "candidates->verify must reproduce the exact pair set")
  }

  test("q40 economical regime: recall 1.0 with candidates well below all-pairs") {
    // The clustered-corpus regime where IVF blocking pays: the q40
    // grouped-variant corpus has a similarity gap, so multi-probe
    // candidates are a small fraction of n(n-1)/2 while still
    // containing every true pair (q24's gradual tail needs
    // near-exhaustive probing — economics are a data property).
    import graft.queries.PipelineQueries._
    val corpus = groupedEmbeddings(emb).cache()
    try {
      val n = corpus.count()
      val centroids = IvfIndex.train(
        corpus, "vec_id", "embedding", nlist = EconNlist, spreadInit = true)
      val cands = IvfIndex.nearDupCandidates(
        corpus, "vec_id", "embedding", centroids, nprobe = EconProbe).cache()
      try {
        val nCands = cands.count()
        val allPairs = n * (n - 1) / 2
        assert(nCands <= allPairs / 4,
          s"not economical: $nCands candidates vs $allPairs pairs")
        val exact = CosineKnn.nearDuplicatePairs(corpus, "vec_id", "embedding", EconCos)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val verified = CosineKnn.verifyPairs(cands, corpus, "vec_id", "embedding", EconCos)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(exact.nonEmpty && verified == exact,
          s"recall must be 1.0: ${verified.size} verified vs ${exact.size} exact")
      } finally cands.unpersist()
    } finally corpus.unpersist()
  }

  test("q68 hyperplane LSH: high recall with real pruning on the clustered corpus") {
    import graft.queries.PipelineQueries._
    val corpus = groupedEmbeddings(emb).cache()
    try {
      val n = corpus.count()
      val cands = CosineLsh.candidatePairs(corpus, "vec_id", "embedding", EmbDim).cache()
      try {
        val nCands = cands.count()
        val allPairs = n * (n - 1) / 2
        // banding must actually prune (stateless LSH's value) ...
        assert(nCands <= allPairs / 2,
          s"no pruning: $nCands candidates vs $allPairs pairs")
        val exact = CosineKnn.nearDuplicatePairs(corpus, "vec_id", "embedding", EconCos)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val verified = CosineKnn.verifyPairs(cands, corpus, "vec_id", "embedding", EconCos)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // ... at high-but-sub-1.0 recall (probabilistic by design,
        // deterministic given the corpus) with exact precision
        assert(verified.subsetOf(exact), "verify stage must be exact")
        val recall = verified.size.toDouble / exact.size
        assert(exact.nonEmpty && recall >= 0.85,
          s"recall $recall: ${verified.size} of ${exact.size}")
        info(f"recall $recall%.3f, candidates $nCands of $allPairs pairs")
      } finally cands.unpersist()
    } finally corpus.unpersist()
  }

  test("LSH plane matrix is deterministic and matches the SQL formula") {
    val m1 = CosineLsh.planes(8)
    val m2 = CosineLsh.planes(8)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(x => x >= -1.0 && x <= 1.0))
    // spot: the JVM scalar hash behind the components equals the
    // Column-form x31 used everywhere else
    val s = spark
    import s.implicits._
    val got = Seq("hp:0:0", "hp:7:3").toDF("s")
      .select(graft.text.Hashing.x31(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(graft.text.Hashing.x31Jvm("hp:0:0"),
      graft.text.Hashing.x31Jvm("hp:7:3")))
  }

  test("assign is a pure projection: no exchange, no window, no join in its plan") {
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nlist = 8)
    val p = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
      .queryExecution.executedPlan.toString
    Seq("Exchange", "Window", "Join").foreach { bad =>
      assert(!p.contains(bad), s"assign plan contains $bad:\n$p")
    }
    assert(p.contains("nearest_cells"), s"native expression missing:\n$p")
  }

  test("train is deterministic") {
    val c1 = IvfIndex.train(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    val c2 = IvfIndex.train(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("q108: frozen-centroid append — union assignment splits, result is exact") {
    import graft.queries.{PipelineQueries => L, QueryUtil}
    import org.apache.spark.sql.functions._
    val emb = QueryUtil.table(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % L.AnnDeltaMod =!= 0)
    val delta = emb.filter(col("vec_id") % L.AnnDeltaMod === 0)
    val cents = IvfIndex.train(base, "vec_id", "embedding", nlist = L.AnnNlist)

    // the incremental contract: assigning base and delta separately
    // under frozen centroids equals assigning the union in one pass
    def cells(df: org.apache.spark.sql.DataFrame) =
      IvfIndex.assign(df, "vec_id", "embedding", cents)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(base) ++ cells(delta) == cells(emb))

    // exhaustive-probe regime over the merged index == brute force
    val inc = L.annIncremental(spark, sfDir).collect().map(_.toSeq)
    val exact = L.knnCosine(spark, sfDir).collect().map(_.toSeq)
    assert(inc.toSeq == exact.toSeq)

    // economical regime on the merged index still finds most true
    // neighbors (recall floor; nprobe 6 of 16 mirrors SimilaritySpec's
    // measured regime on this corpus)
    val merged = IvfIndex.assign(base, "vec_id", "embedding", cents)
      .unionByName(IvfIndex.assign(delta, "vec_id", "embedding", cents))
    val econ = IvfIndex.search(merged, "vec_id", "embedding",
        emb.filter(col("vec_id") < L.KnnQueries), cents, L.KnnK, nprobe = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = exact.map(s => (s(0).asInstanceOf[Long], s(2).asInstanceOf[Long])).toSet
    val recall = truth.count(econ.contains).toDouble / truth.size
    assert(recall >= 0.5, s"economical recall $recall")
  }

  test("q133: truncation recall is monotone in prefix length; a driver recount agrees at d=8") {
    import graft.queries.{PipelineQueries => L, QueryUtil}
    val rows = L.matryoshkaRecall(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == L.MrlDims)
    val cap = (L.KnnQueries * L.MrlK).toLong
    rows.foreach { case (d, n, pm) =>
      assert(n >= 0 && n <= cap, s"dim $d overlap $n")
      assert(pm == 1000L * n / cap, s"dim $d pm")
    }
    // more dims can only help retrieval against the full-dim truth
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq, "recall not monotone")
    // exact driver-side recount of the d=8 overlap (sequential-sum cosine,
    // same tiebreak) — proves the engine ranking is the declared one
    val emb = QueryUtil.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def topK(qid: Long, d: Int): Set[Long] =
      emb.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(emb.find(_._1 == qid).get._2, v, d)) }
        .sortBy { case (id, c) => (-c, id) }.take(L.MrlK).map(_._1).toSet
    val qids = emb.map(_._1).filter(_ < L.KnnQueries)
    val overlap8 = qids.map(q => (topK(q, 8) & topK(q, 64)).size.toLong).sum
    assert(rows.find(_._1 == 8).get._2 == overlap8)
  }

  test("q148: covariance numerators re-derive from a driver recompute; diagonal PSD") {
    import graft.queries.{QueryUtil, ScaleQueries}
    val rows = ScaleQueries.embCovariance(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val emb = QueryUtil.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    val d = emb.head.length
    assert(rows.size == d * (d + 1) / 2)
    def q(x: Float): Long = math.floor(x.toDouble * ScaleQueries.CovQuant).toLong
    // exact recompute for a handful of pairs incl. the diagonal
    for ((d1, d2) <- Seq((0, 0), (0, 1), (5, 5), (3, 60), (63, 63))) {
      val n = emb.length.toLong
      val s12 = emb.map(v => q(v(d1)) * q(v(d2))).sum
      val s1 = emb.map(v => q(v(d1))).sum
      val s2 = emb.map(v => q(v(d2))).sum
      assert(rows((d1.toLong, d2.toLong)) == ((n, n * s12 - s1 * s2)), s"($d1,$d2)")
    }
    // diagonal of a covariance matrix is non-negative
    (0 until d).foreach(i => assert(rows((i.toLong, i.toLong))._2 >= 0L, s"var($i)"))
  }

  test("q149: iterate is max-normalized, deterministic, and better than a random axis") {
    import graft.queries.ScaleQueries
    val a = ScaleQueries.pcaPower(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length == 64)
    // renormalization invariant: the largest |component| is exactly 10^6
    assert(a.map(t => math.abs(t._2)).max == 1000000L)
    val dom = a.head._3
    assert(dom >= 0L && dom <= 1000L)
    // the dominant direction explains at least the average per-axis
    // share (1000/64 ≈ 15‰) — anything less means the iteration left
    // the v0 simplex for a WORSE direction, which power iteration on a
    // PSD matrix cannot do at convergence
    assert(dom >= 1000L / 64L, s"dominance $dom below the uniform share")
    // pure function: a second run is bit-identical
    val b = ScaleQueries.pcaPower(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("q159: MMR selection equals a driver-side greedy over exact micro-cosines") {
    import graft.queries.PipelineQueries.{MmrPool, MmrK, MmrQueryId}
    val got = graft.queries.PipelineQueries.mmrSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == MmrK && got.map(_._1).toSeq == (1L to MmrK))
    assert(got.map(_._2).distinct.length == MmrK)

    // independent replay from raw floats with sequential-sum cosine
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dot, na, nb, i) = (0d, 0d, 0d, 0)
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(MmrQueryId)
    val pool = vecs.toSeq.filter(_._1 != MmrQueryId)
      .map { case (id, v) => (id, math.round(1e6 * cos(q, v))) }
      .sortBy { case (id, r) => (-r, id) }.take(MmrPool)
    val poolIds = pool.map(_._1)
    val sims = (for (a <- poolIds; b <- poolIds if a != b)
      yield ((a, b), math.round(1e6 * cos(vecs(a), vecs(b))))).toMap
    var sel = Vector.empty[(Long, Long, Long)]
    var rem = pool.toVector
    while (sel.length < MmrK) {
      val scored = rem.map { case (id, r) =>
        val ms = if (sel.isEmpty) 0L else sel.map(s => sims((id, s._1))).max
        (id, r, (7 * r) / 10 - (3 * ms) / 10)
      }
      val best = scored.minBy { case (id, _, sc) => (-sc, id) }
      sel :+= best
      rem = rem.filterNot(_._1 == best._1)
    }
    val want = sel.zipWithIndex.map { case ((id, r, sc), i) => (i + 1L, id, r, sc) }
    assert(got.toSeq == want)
    // the first pick is the most relevant; later picks trade relevance
    // for diversity (the selection is not just the rel-ranked head)
    assert(got.head._2 == pool.head._1)
    val relHead = pool.take(MmrK).map(_._1).toSet
    assert(got.map(_._2).toSet != relHead, "MMR degenerated to pure relevance")
  }

  test("q168: JL distortion equals a driver replay; the isometry holds on average") {
    import graft.queries.PipelineQueries.{JlK, JlQuant, JlSample}
    val r = graft.queries.PipelineQueries.jlDistortion(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") < JlSample)
      .collect().map(x => x.getLong(0) ->
        x.getSeq[Float](1).map(f => math.floor(f.toDouble * JlQuant).toLong).toArray)
      .sortBy(_._1)
    val d = vecs.head._2.length
    val signs = Array.tabulate(JlK, d)((j, dd) =>
      if (graft.text.Hashing.h60Jvm(s"jl:$j:$dd") % 2 == 0) 1L else -1L)
    def proj(q: Array[Long]): Array[Long] =
      Array.tabulate(JlK)(j => (0 until d).map(i => q(i) * signs(j)(i)).sum)
    val ratios = for {
      i <- vecs.indices; k <- (i + 1) until vecs.length
    } yield {
      val (qa, qb) = (vecs(i)._2, vecs(k)._2)
      val dOrig = (0 until d).map(x => { val t = qa(x) - qb(x); t * t }).sum
      val (pa, pb) = (proj(qa), proj(qb))
      val dProj = (0 until JlK).map(x => { val t = pa(x) - pb(x); t * t }).sum
      (1000L * dProj) / (JlK * dOrig)
    }
    val want = (ratios.length.toLong, ratios.sum / ratios.length,
      ratios.min, ratios.max, ratios.count(r => r >= 500 && r <= 1500).toLong)
    assert(got == want)
    // the JL isometry: mean distortion within 15% of 1, most pairs in band
    assert(math.abs(got._2 - 1000) < 150, s"mean ${got._2}")
    assert(got._5 * 10 >= got._1 * 8, s"only ${got._5}/${got._1} in band")
  }

  test("q173: deflated component is near-orthogonal, subdominant, deterministic") {
    val a = graft.queries.ScaleQueries.pca2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.length == 64 && a.map(_._1).toSeq == (0L until 64))
    val (dom2, ortho) = (a.head._3, a.head._4)
    // v2 explains a positive but SUBDOMINANT share vs q149's v1
    val dom1 = graft.queries.ScaleQueries.pcaPower(spark, sfDir)
      .collect().head.getLong(2)
    assert(dom2 > 0 && dom2 <= dom1, s"dom2 $dom2 vs dom1 $dom1")
    // deflation worked: v1 . v2 under 5% of the norm product
    assert(ortho < 50, s"ortho_pm $ortho")
    // pure function: re-run is bit-identical
    val b = graft.queries.ScaleQueries.pca2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("q249: hubness histogram equals a naive all-vectors kNN replay") {
    import graft.queries.PipelineQueries
    val out = PipelineQueries.hubnessAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    val vs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val k = PipelineQueries.HubK
    val occ = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((q, qv) <- vs) {
      vs.filter(_._1 != q)
        .map { case (n, nv) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }.take(k)
        .foreach { case (n, _) => occ(n) += 1L }
    }
    val hist = vs.map(v => occ(v._1)).groupBy(identity)
      .map { case (o, g) => (o, g.size.toLong, o >= 2L * k) }
      .toSeq.sortBy(_._1)
    assert(out.toSeq == hist, "histogram mismatch")
    // conservation: every kNN list contributes exactly k occurrences
    assert(out.map(r => r._1 * r._2).sum == vs.length.toLong * k)
    assert(out.map(_._2).sum == vs.length.toLong)
  }

  test("q250: silhouette audit equals a driver replay of the micro-int fold") {
    val out = graft.queries.ScaleQueries.silhouetteAudit(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val vs = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    def trunc(num: Long, den: Long): Long =
      if (num >= 0) num / den else -((-num) / den)
    val labels = vs.map(_._2).distinct.sorted
    val cent = labels.map { l =>
      val grp = vs.filter(_._2 == l)
      l -> Array.tabulate(grp.head._3.length) { i =>
        trunc(grp.map(_._3(i)).sum, grp.length.toLong) }
    }.toMap
    def d2(x: Array[Long], c: Array[Long]): Long =
      x.indices.map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
    val sp = vs.map { case (_, l, x) =>
      val a = d2(x, cent(l))
      val b = labels.filter(_ != l).map(c => d2(x, cent(c))).min
      l -> (if (b >= a) 1000L * (b - a) / math.max(b, 1L)
            else -(1000L * (a - b) / math.max(a, 1L)))
    }
    for ((l, (n, mean, miss)) <- out) {
      val g = sp.filter(_._1 == l).map(_._2)
      assert(n == g.length.toLong, s"label $l n")
      assert(mean == trunc(g.sum, g.length.toLong), s"label $l mean")
      assert(miss == g.count(_ < 0).toLong, s"label $l misassigned")
      assert(math.abs(mean) <= 1000L)
    }
    assert(out.map(_._1).toSeq == labels.toSeq)
  }
}
