package graft.operators

import graft.SparkSpec

import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {

  /** Reference union-find. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.components(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on a random graph (multiple components)") {
    val rnd = new Random(13)
    val edges = Seq.fill(120)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(e => e._1 != e._2)
    assert(run(edges) == ufComponents(edges))
  }

  test("long chain converges (worst-case diameter)") {
    val edges = (0L until 30L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 31 && got.values.forall(_ == 0L))
  }

  test("self-loops and duplicate edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (5L, 6L))
    assert(run(edges) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  // ---- alternating star contraction (Kiveris SoCC'14) ----------------

  private def runStar(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val s = spark
    import s.implicits._
    val (df, rounds) = ConnectedComponents
      .componentsStarWithRounds(edges.toDF("s", "d"), "s", "d")
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("star: matches union-find and min-label on random graphs") {
    val rnd = new Random(29)
    // density regimes: sparse forests (many components), near the
    // connectivity threshold, and dense (one giant component) — the
    // contraction must agree with union-find in all of them
    val shapes = Seq((60, 30), (65, 65), (90, 180), (50, 400))
    for (((n, m), trial) <- shapes.zipWithIndex) {
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val want = ufComponents(edges)
      val (got, rounds) = runStar(edges)
      assert(got == want, s"trial $trial (n=$n m=$m)")
      assert(got == run(edges), s"trial $trial: star != min-label")
      assert(rounds <= 15, s"trial $trial took $rounds rounds")
    }
  }

  test("star: 10^4-node chain converges in O(log n) rounds, not O(n)") {
    // min-label propagation needs diameter ≈ 10^4 rounds here; the
    // alternating algorithm must finish in logarithmic rounds — the
    // whole point of the upgrade (ConnectedComponents scaladoc).
    val nChain = 10000L
    val edges = (0L until nChain).map(i => (i, i + 1))
    val (got, rounds) = runStar(edges)
    assert(got.size == nChain + 1 && got.values.forall(_ == 0L))
    assert(rounds <= 2 * (math.log(nChain.toDouble) / math.log(2)).ceil.toInt,
      s"chain of $nChain took $rounds alternating rounds")
  }

  test("star: self-loops, duplicates, singleton roots") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (5L, 6L), (9L, 9L))
    val (got, _) = runStar(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("capped local contraction stays connectivity-equivalent and bounded") {
    // a chain visiting many distinct nodes blows past a tiny cap fast;
    // the pre-pass must then PASS EDGES THROUGH, never grow the map or
    // drop connectivity. Equivalence check: same reference components.
    val rnd = new Random(41)
    val chain = (0L until 200L).map(i => (i, i + 1))
    val noise = Seq.fill(150)(
      (rnd.nextInt(300).toLong + 500, rnd.nextInt(300).toLong + 500))
      .filter(e => e._1 != e._2)
    val edges = rnd.shuffle(chain ++ noise)
    for (cap <- Seq(0, 1, 7, 64, 1 << 20)) {
      val out = ConnectedComponents
        .contractPartition(edges.iterator, cap).toSeq
      assert(ufComponents(out) == ufComponents(edges), s"cap=$cap")
      // bounded: the emitted star edges (beyond pass-throughs) cover
      // at most `cap` nodes — the map never grew past it
      val starNodes = out.diff(edges).flatMap(e => Seq(e._1, e._2)).distinct
      assert(starNodes.size <= cap, s"cap=$cap leaked ${starNodes.size} nodes")
    }
  }
}
