package graft.operators

import graft.SparkSpec

/** [[Bfs]] against hand-computable graphs plus the q211 properties the
  * hash oracle cannot isolate (early frontier exhaustion, depth bound,
  * unreachability-as-absence). */
class BfsSpec extends SparkSpec {

  private def run(arcs: Seq[(Long, Long)], seed: Long, maxHops: Int):
      Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Bfs.run(arcs.toDF("src", "dst"), seed, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def undirected(edges: (Long, Long)*): Seq[(Long, Long)] =
    edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("chain: distances count hops; nodes past the bound are absent") {
    val chain = undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    assert(run(chain, 1L, 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(run(chain, 1L, 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("cycle: first reach wins — both directions meet at the far side") {
    val cycle = undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    assert(run(cycle, 1L, 5) == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("disconnected component is absent, not distance-capped") {
    val g = undirected(1L -> 2L) ++ undirected(10L -> 11L)
    assert(run(g, 1L, 6) == Map(1L -> 0L, 2L -> 1L))
  }

  test("early exhaustion: empty frontier stops the loop before maxHops") {
    // star: everything reached at round 1; rounds 2..20 must not loop
    val star = undirected(1L -> 2L, 1L -> 3L, 1L -> 4L)
    assert(run(star, 1L, 20) == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("directed arcs are honored (no implicit reverse edge)") {
    assert(run(Seq(1L -> 2L, 2L -> 3L), 3L, 4) == Map(3L -> 0L))
    assert(run(Seq(1L -> 2L, 2L -> 3L), 1L, 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
