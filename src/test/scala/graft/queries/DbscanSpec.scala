package graft.queries

import graft.SparkSpec

/** q226 DBSCAN: the density semantics on hand pair-graphs (clusters
  * grow through CORE points only; border adoption is deterministic
  * min-label; noise is neither) and full equality with a driver-side
  * brute-force DBSCAN on the real embeddings. */
class DbscanSpec extends SparkSpec {

  private def run(pairs: Seq[(Long, Long)], ids: Seq[Long],
      minPts: Long): Map[Long, (String, Long)] = {
    val s = spark
    import s.implicits._
    PipelineQueries.dbscanFrom(
        pairs.toDF("doc_a", "doc_b"), ids.toDF("vec_id"), minPts)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  test("clique is core; pendant is border; isolate is noise") {
    // 1-2-3-4 mutual clique (deg 4 each with minPts 4), 5 attached to 1
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val g = clique :+ (1L -> 5L)
    val r = run(g, 1L to 6L, minPts = 4L)
    (1L to 3L).foreach(i => assert(r(i) == ("core", 1L), i))
    assert(r(4L) == ("core", 1L))
    assert(r(5L) == ("border", 1L)) // deg 2 < 4: border via core neighbor 1
    assert(r(6L) == ("noise", -1L)) // no pairs at all
  }

  test("two dense regions joined only through a border point stay separate") {
    val cliqueA = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val cliqueB = for { a <- 11L to 14L; b <- 11L to 14L if a < b } yield (a, b)
    // 20 bridges both cliques but has only 2 neighbors: never core
    val g = cliqueA ++ cliqueB ++ Seq(1L -> 20L, 11L -> 20L)
    val r = run(g, (1L to 4L) ++ (11L to 14L) :+ 20L, minPts = 4L)
    (1L to 4L).foreach(i => assert(r(i) == ("core", 1L)))
    (11L to 14L).foreach(i => assert(r(i) == ("core", 11L)))
    // the border bridge adopts the MIN label of its core neighbors
    assert(r(20L) == ("border", 1L))
    // raise the bridge to core (minPts 3): the regions MERGE through it
    val r3 = run(g, (1L to 4L) ++ (11L to 14L) :+ 20L, minPts = 3L)
    assert(r3.values.forall(_ == ("core", 1L)))
  }

  test("core singleton roots its own cluster") {
    // star around 1: 1 has deg 4 (core); leaves have deg 2 (border)
    val g = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L)
    val r = run(g, 1L to 4L, minPts = 4L)
    assert(r(1L) == ("core", 1L))
    (2L to 4L).foreach(i => assert(r(i) == ("border", 1L)))
  }

  test("q226 equals a driver-side brute-force DBSCAN on the real embeddings") {
    val emb = QueryUtil.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>)").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var (d, nx, ny) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    val ids = emb.map(_._1)
    val nbrs = emb.map { case (a, va) =>
      a -> emb.collect { case (b, vb)
        if b != a && cos(va, vb) >= PipelineQueries.NearDupCos => b }.toSet
    }.toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= PipelineQueries.DbscanMinPts).toSet
    // components of the core-core graph (union-find by min label)
    var label = core.map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      core.foreach { i =>
        val m = (nbrs(i).intersect(core) + i).map(label).min
        if (m < label(i)) { label += i -> m; changed = true }
      }
    }
    val want = ids.map { i =>
      if (core(i)) i -> ("core", label(i))
      else {
        val cn = nbrs(i).intersect(core)
        if (cn.nonEmpty) i -> ("border", cn.map(label).min)
        else i -> ("noise", -1L)
      }
    }.toMap
    val got = PipelineQueries.dbscan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == want)
    // the synthetic corpus has genuine dense structure AND background
    val roles = got.values.map(_._1).toSet
    assert(roles.contains("core") && roles.contains("noise"), roles)
  }
}
