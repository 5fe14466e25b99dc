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
}
