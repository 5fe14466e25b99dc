package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FastSS deletion-neighborhood edit-distance join (q76's operator):
  * brute-force equality on randomly mutated corpora (substitutions,
  * insertions, deletions — every ed≤1 shape), plus the plan claim
  * that candidate generation stays lambda- and UDF-free. */
class EditDistanceJoinSpec extends SparkSpec {

  private def bruteForce(rows: Seq[(Long, String)], k: Int = 1): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= k
    } yield (ia, ib)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int = 1): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "name")
    val joined =
      if (k == 1) EditDistanceJoin.selfJoinEd1(df, "id", "name")
      else EditDistanceJoin.selfJoinEd2(df, "id", "name")
    joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("matches brute force on random mutated corpora (all ed<=1 shapes)") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "abcde"
    for (trial <- 1 to 20) {
      val base = IndexedSeq.fill(30)(
        (1 to (3 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(5))).mkString)
      val mutated = base.flatMap { s =>
        val i = rnd.nextInt(s.length)
        Seq(s,
          s.updated(i, alphabet(rnd.nextInt(5))),                  // substitution
          s.substring(0, i) + s.substring(i + 1),                  // deletion
          s.substring(0, i) + alphabet(rnd.nextInt(5)) + s.substring(i)) // insertion
      }.distinct.filter(_.nonEmpty)
      val rows = mutated.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      assert(run(rows) == bruteForce(rows), s"trial $trial")
    }
  }

  test("identical strings under different ids join at distance 0") {
    val rows = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
    assert(run(rows) == Set((1L, 2L)))
  }

  test("one-character and empty-adjacent strings are handled") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "x"))
    // single chars pairwise ed 1 via substitution (shared "" variant);
    // "ab" ed 1 from "a"/"b" (insertion); lev("ab","x") = 2 — excluded
    assert(run(rows) == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
  }

  test("k=2 matches brute force on random double-mutated corpora") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcde"
    for (trial <- 1 to 12) {
      val base = IndexedSeq.fill(20)(
        (1 to (4 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(5))).mkString)
      def mutate(s: String): String = {
        val i = rnd.nextInt(s.length max 1)
        rnd.nextInt(3) match {
          case 0 if s.nonEmpty => s.updated(i min (s.length - 1), alphabet(rnd.nextInt(5)))
          case 1 if s.length > 1 => s.substring(0, i) + s.substring(i + 1)
          case _ => s.substring(0, i) + alphabet(rnd.nextInt(5)) + s.substring(i)
        }
      }
      // single AND double mutations: every ed<=2 shape, incl. ins+del shifts
      val mutated = base.flatMap(s => Seq(s, mutate(s), mutate(mutate(s))))
        .distinct.filter(_.nonEmpty)
      val rows = mutated.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      assert(run(rows, k = 2) == bruteForce(rows, k = 2), s"trial $trial")
    }
  }

  test("k=2 catches same-length shift pairs and run-internal double deletions") {
    val rows = Seq(
      (1L, "cust012"), (2L, "cust123"),   // ed 2: delete '0' + insert '3'
      (3L, "ab00cd"), (4L, "abcd"),       // ed 2: both zeros of one run
      (5L, "xyz"), (6L, "xyz"),           // ed 0 under distinct ids
      (7L, "abcdef"))                     // ed 2 from "abcd": append "ef"
    val got = run(rows, k = 2)
    assert(got.contains((1L, 2L)), "shift pair missed")
    assert(got.contains((3L, 4L)), "double run deletion missed")
    assert(got.contains((5L, 6L)), "identical pair missed")
    assert(got.contains((4L, 7L)), "two-append pair missed")
    assert(got == bruteForce(rows, k = 2))
  }

  test("candidate pipeline plans no UDF and no interpreted lambda") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    for (joined <- Seq(EditDistanceJoin.selfJoinEd1(df, "id", "name"),
        EditDistanceJoin.selfJoinEd2(df, "id", "name"))) {
      val p = joined.queryExecution.executedPlan.toString
      Seq("ScalaUDF", "BatchEvalPython", "lambdafunction").foreach { bad =>
        assert(!p.contains(bad), s"plan contains $bad:\n$p")
      }
    }
  }
}
