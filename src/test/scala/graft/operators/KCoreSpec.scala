package graft.operators

import graft.SparkSpec

/** [[KCore]]: peeling semantics on hand graphs (cycle survives where
  * star and tree collapse — the recursive property a degree threshold
  * lacks), driver-side reference equality, and the q228 fixpoint
  * claim (round R ≡ round R+1 on the real graph). */
class KCoreSpec extends SparkSpec {

  private def run(und: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val arcs = und ++ und.map(_.swap)
    KCore.run(arcs.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycle is its own 2-core; star and path have none") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(cycle, 2L, 5) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // star: center has degree 4 but every leaf has 1 — peeling the
    // leaves strands the center: NO 2-core (a plain degree >= 2
    // threshold would wrongly keep the center)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(run(star, 2L, 5).isEmpty)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, 2L, 5).isEmpty)
  }

  test("cascade peeling needs multiple rounds; pendant chain unravels") {
    // triangle with a chain hanging off: 1-2-3 triangle, 3-4-5-6 chain
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val r = run(g, 2L, 6)
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round is NOT enough: only 6 is peeled, 5 and 4 still look alive
    val r1 = run(g, 2L, 1)
    assert(r1.contains(4L) && r1.contains(5L) && !r1.contains(6L))
  }

  test("matches a driver-side peel on a dense-ish graph") {
    val und = (for {
      a <- 0L until 14L; b <- 0L until 14L
      if a < b && (a * 5 + b * 3) % 4 == 0
    } yield (a, b)).toSeq
    val k = 3L
    var alive = (und.map(_._1) ++ und.map(_._2)).distinct.toSet
    var changed = true
    while (changed) {
      val deg = alive.map(v => v -> und.count { case (x, y) =>
        (x == v && alive(y)) || (y == v && alive(x)) }).toMap
      val next = alive.filter(deg(_) >= k)
      changed = next != alive
      alive = next
    }
    val want = alive.map(v => v -> und.count { case (x, y) =>
      (x == v && alive(y)) || (y == v && alive(x)) }.toLong).toMap
    assert(run(und, k, 14) == want)
  }

  test("q228 reaches its fixpoint within CoreRounds on the real graph") {
    import graft.queries.GraphQueries
    val atR = GraphQueries.kcorePartners(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(atR.nonEmpty)
    // every in-core degree honors the core order
    atR.foreach { case (n, d) => assert(d >= GraphQueries.CoreK, n) }
    // one more round changes nothing: the bounded peel IS the k-core
    val edges = {
      import org.apache.spark.sql.functions._
      val pairs = graft.queries.QueryUtil.table(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(graft.queries.QueryUtil.table(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2L).as("c"),
          (col("l_suppkey") * 2L + 1L).as("s"))
        .distinct()
      pairs.select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select("e.src", "e.dst")
    }
    val plusOne = KCore
      .run(edges, GraphQueries.CoreK, GraphQueries.CoreRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .map { case (n, d) =>
        (if (n % 2 == 0) s"C${n / 2}" else s"S${n / 2}") -> d }
      .toSeq.sorted
    assert(plusOne == atR)
  }
}
