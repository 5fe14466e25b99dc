package graft.operators

import graft.SparkSpec
import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  /** Driver-side reference implementation of the exact integer
    * recurrence, for equality checks on small graphs. */
  private def refRanks(edges: Seq[(String, String)], iters: Int,
      dampingPct: Int = 85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (100 - dampingPct) * PageRank.RankUnit / 100
    var r = nodes.map(_ -> PageRank.RankUnit).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n =>
        n -> (base + dampingPct * contrib.getOrElse(n, 0L) / 100)).toMap
    }
    r
  }

  private def runOn(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches the exact integer recurrence on a hand graph") {
    // cycle a->b->c->a plus a feeder d->a and a hub e with two out-edges
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a",
      "e" -> "a", "e" -> "b")
    for (iters <- Seq(1, 3))
      assert(runOn(edges, iters) == refRanks(edges, iters), s"iters=$iters")
  }

  test("no-in-edge nodes settle at the damping base; authority orders by in-mass") {
    val edges = Seq("d" -> "a", "e" -> "a", "f" -> "a", "f" -> "b")
    val r = runOn(edges, 3)
    val base = 15 * PageRank.RankUnit / 100
    Seq("d", "e", "f").foreach(n => assert(r(n) == base, n))
    assert(r("a") > r("b") && r("b") > base)
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (s"n${i % 17}", s"n${i % 23}"))
      .distinct.toDF("src", "dst")
    val a = PageRank.run(edges, 3).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = PageRank.run(edges.repartition(7), 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  /** Driver-side reference for the PERSONALIZED recurrence: teleport
    * mass (init and per-round base) only on seeds. */
  private def refPprRanks(edges: Seq[(String, String)], seeds: Set[String],
      iters: Int, dampingPct: Int = 85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (100 - dampingPct) * PageRank.RankUnit / 100
    var r = nodes.map(n =>
      n -> (if (seeds(n)) PageRank.RankUnit else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n =>
        n -> ((if (seeds(n)) base else 0L) +
          dampingPct * contrib.getOrElse(n, 0L) / 100)).toMap
    }
    r
  }

  private def runPprOn(edges: Seq[(String, String)], seeds: Seq[String],
      iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.runPersonalized(edges.toDF("src", "dst"),
        seeds.toDF("node"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("personalized: matches the seeded recurrence on a hand graph") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a",
      "e" -> "a", "e" -> "b")
    for (iters <- Seq(1, 3))
      assert(runPprOn(edges, Seq("a", "e"), iters) ==
        refPprRanks(edges, Set("a", "e"), iters), s"iters=$iters")
  }

  test("personalized: nodes unreachable from the seeds stay at exactly zero") {
    // two components; seeds only in the first
    val edges = Seq("a" -> "b", "b" -> "a", "x" -> "y", "y" -> "x")
    val r = runPprOn(edges, Seq("a"), 3)
    assert(r("x") == 0L && r("y") == 0L)
    assert(r("a") > 0L && r("b") > 0L)
    // seeds outside the graph are ignored by the flag join
    assert(runPprOn(edges, Seq("a", "zz"), 2) == runPprOn(edges, Seq("a"), 2))
  }

  test("q111: top-K authorities are well-formed and strictly ranked") {
    val rows = GraphQueries.purchasePagerank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == GraphQueries.PrTopK)
    assert(rows.forall { case (n, _) => n.matches("[CS]\\d+") })
    // descending by rank with the node tiebreak
    rows.sliding(2).foreach {
      case Array((n1, r1), (n2, r2)) =>
        assert(r1 > r2 || (r1 == r2 && n1 < n2))
      case _ =>
    }
    // suppliers aggregate orders from many customers: the head of the
    // authority ranking is supplier-dominated
    assert(rows.take(5).count(_._1.startsWith("S")) >= 3)
    // every rank at least the damping base
    assert(rows.forall(_._2 >= 15 * PageRank.RankUnit / 100))
  }

  test("q111: per-iteration shuffle cost is constant — no edge-table re-shuffle creeps in") {
    import spark.implicits._
    val edges = (1 to 500).map(i => (s"n${i % 37}", s"n${i % 53}"))
      .distinct.toDF("src", "dst")
    // exchange count must grow LINEARLY in iterations with a small
    // per-iteration constant: the documented scale contract is that
    // each round shuffles only |V|-row per-node tables (co-locate +
    // re-aggregate), never the persisted edge table. A superlinear or
    // large delta means an edit made the big side move per round.
    def exchanges(iters: Int): Int = {
      val p = PageRank.plan(edges, iters).queryExecution.executedPlan.toString
      "ShuffleExchange".r.findAllIn(p).size
    }
    val (c1, c2, c3) = (exchanges(1), exchanges(2), exchanges(3))
    assert(c2 - c1 == c3 - c2,
      s"exchange growth is not linear in iterations: $c1, $c2, $c3")
    assert(c3 - c2 <= 3,
      s"per-iteration exchange delta ${c3 - c2} > 3 (edge re-shuffle crept in?)")
  }
}
