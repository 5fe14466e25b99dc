package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FastSS deletion-neighborhood edit-distance join (q76's operator):
  * brute-force equality on randomly mutated corpora (substitutions,
  * insertions, deletions — every ed≤1 shape), plus the plan claim
  * that candidate generation stays lambda- and UDF-free. */
class EditDistanceJoinSpec extends SparkSpec {

  private def bruteForce(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
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
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
  }

  private def run(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    EditDistanceJoin.selfJoinEd1(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
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

  test("candidate pipeline plans no UDF and no interpreted lambda") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val p = EditDistanceJoin.selfJoinEd1(df, "id", "name")
      .queryExecution.executedPlan.toString
    Seq("ScalaUDF", "BatchEvalPython", "lambdafunction").foreach { bad =>
      assert(!p.contains(bad), s"plan contains $bad:\n$p")
    }
  }
}
