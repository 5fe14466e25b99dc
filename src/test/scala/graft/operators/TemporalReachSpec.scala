package graft.operators

import graft.SparkSpec

/** [[TemporalReach]] against hand graphs: the time-respecting
  * constraint, earliest-arrival minimization, the gap vs static
  * reachability, and a driver-side reference on a dense graph. */
class TemporalReachSpec extends SparkSpec {

  private def run(arcs: Seq[(Long, Long, Long)], seed: Long, startT: Long,
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    TemporalReach.run(arcs.toDF("src", "dst", "t"), seed, startT, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("paths must respect time: a past edge downstream blocks the walk") {
    // 1 →(t=5) 2 →(t=3) 3: the 2→3 edge happened BEFORE 2 was reached
    val g = Seq((1L, 2L, 5L), (2L, 3L, 3L))
    assert(run(g, 1L, 0L, 4) == Map(1L -> 0L, 2L -> 5L))
    // same edges, workable order → full reach (static view for contrast)
    val ok = Seq((1L, 2L, 3L), (2L, 3L, 5L))
    assert(run(ok, 1L, 0L, 4) == Map(1L -> 0L, 2L -> 3L, 3L -> 5L))
  }

  test("earliest arrival wins across alternative histories") {
    // two routes to 3: via 2 arriving at t=6, direct at t=8
    val g = Seq((1L, 2L, 2L), (2L, 3L, 6L), (1L, 3L, 8L))
    assert(run(g, 1L, 0L, 4)(3L) == 6L)
    // with one round, only the direct edge is usable
    assert(run(g, 1L, 0L, 1)(3L) == 8L)
    // equal times chain: non-decreasing, so t >= arr admits equality
    val eq = Seq((1L, 2L, 4L), (2L, 3L, 4L))
    assert(run(eq, 1L, 0L, 4) == Map(1L -> 0L, 2L -> 4L, 3L -> 4L))
  }

  test("seed release time gates the first hop; arcs are directed") {
    val g = Seq((1L, 2L, 3L), (1L, 4L, 9L), (3L, 1L, 10L))
    // release at t=5: the t=3 edge already happened
    assert(run(g, 1L, 5L, 4) == Map(1L -> 5L, 4L -> 9L))
    // 3→1 exists but 1→3 does not
    assert(!run(g, 1L, 0L, 4).contains(3L))
  }

  test("matches a driver-side temporal relaxation on a dense graph") {
    val arcs = for {
      a <- 0L until 12L; b <- 0L until 12L if a != b
    } yield (a, b, (a * 11 + b * 17) % 23)
    val rounds = 3
    val start = 4L
    var ref = Map(0L -> start)
    for (_ <- 1 to rounds) {
      val relaxed = arcs.flatMap { case (s, d, t) =>
        ref.get(s).filter(t >= _).map(_ => d -> t)
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ts) => n -> ts.map(_._2).min }
    }
    assert(run(arcs, 0L, start, rounds) == ref)
  }

  test("q224 release time monotonicity bites on the real graph") {
    import graft.queries.{GraphQueries, QueryUtil}
    import org.apache.spark.sql.functions._
    val rows = GraphQueries.temporalReach(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // arrivals never precede the release
    rows.values.foreach(a => assert(a >= GraphQueries.ReachStart))
    // re-run the same spread with release at the epoch: arrivals can
    // only get earlier, and some genuinely do — i.e. the mid-corpus
    // release at ReachStart blocks real early paths
    val p = QueryUtil.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("t"))
      .join(QueryUtil.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"), col("t"))
      .distinct()
    val edges = p.select(explode(array(
        struct(col("c").as("src"), col("s").as("dst"), col("t")),
        struct(col("s").as("src"), col("c").as("dst"), col("t")))).as("e"))
      .select("e.src", "e.dst", "e.t")
    val seed = edges.agg(min(col("src"))).head().getLong(0)
    val early = TemporalReach
      .run(edges, seed, 0L, GraphQueries.ReachRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .map { case (n, a) =>
        (if (n % 2 == 0) s"C${n / 2}" else s"S${n / 2}") -> a }.toMap
    // monotone: later release never reaches anything the earlier missed
    assert(rows.keySet.subsetOf(early.keySet))
    rows.foreach { case (n, a) => assert(early(n) <= a, n) }
    // strictness: some node is reached strictly earlier when released
    // at the epoch (its early paths are blocked for the 9131 release)
    assert(early.exists { case (n, a) =>
      a < rows.getOrElse(n, Long.MaxValue) })
  }
}
