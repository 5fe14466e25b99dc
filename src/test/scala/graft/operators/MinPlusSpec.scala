package graft.operators

import graft.SparkSpec

/** [[MinPlus]] against hand graphs: the ≤K-hop Bellman-Ford
  * invariant, min-over-paths, and directedness. */
class MinPlusSpec extends SparkSpec {

  private def run(arcs: Seq[(Long, Long, Long)], seed: Long,
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    MinPlus.run(arcs.toDF("src", "dst", "w"), seed, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("picks the cheaper of two paths; direct-but-expensive loses") {
    // 1→2→3 costs 2+3=5; direct 1→3 costs 9
    val g = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 9L))
    assert(run(g, 1L, 4) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
    // with one round only, the two-hop path is out of reach: direct wins
    assert(run(g, 1L, 1) == Map(1L -> 0L, 2L -> 2L, 3L -> 9L))
  }

  test("hop bound is a real constraint, then relaxes to the true optimum") {
    // long cheap chain vs short expensive shortcut
    val g = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L),
      (1L, 5L, 10L))
    assert(run(g, 1L, 2)(5L) == 10L) // chain needs 4 hops
    assert(run(g, 1L, 4)(5L) == 4L)
    assert(run(g, 1L, 9)(5L) == 4L) // extra rounds change nothing
  }

  test("unreachable nodes are absent; arcs are directed; zero weights legal") {
    val g = Seq((1L, 2L, 0L), (3L, 4L, 1L))
    val r = run(g, 1L, 5)
    assert(r == Map(1L -> 0L, 2L -> 0L))
  }

  test("matches a driver-side Bellman-Ford on a random-ish dense graph") {
    val arcs = for {
      a <- 0L until 12L; b <- 0L until 12L if a != b
      w = (a * 7 + b * 13) % 19 + 1
    } yield (a, b, w)
    val rounds = 3
    var ref = Map(0L -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = arcs.flatMap { case (s, d, w) =>
        ref.get(s).map(c => d -> (c + w))
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, cs) => n -> cs.map(_._2).min }
    }
    assert(run(arcs, 0L, rounds) == ref)
  }
}
