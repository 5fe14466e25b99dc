package graft.queries

import graft.SparkSpec

/** Cross-engine integer-division semantics pin. Several exact-integer
  * gates (q111 PageRank, q117 Holt — whose trend goes NEGATIVE, q122,
  * q131, q134) assume Spark `div` == Scala `Long./` == DuckDB `//` on
  * every sign combination. DuckDB `//` was MEASURED (2026-08, v1.x) as
  * truncation toward zero — `-7 // 2 = -3`, `7 // -2 = -3`,
  * `-7 // -2 = 3` — i.e. NOT floor division (floor would give -4, -4,
  * 3). This spec pins the Spark and Scala sides against those measured
  * values so a comment or engine drift can't silently de-align the
  * three engines on negative operands. */
class DivSemanticsSpec extends SparkSpec {

  private val cases = Seq(
    (-7L, 2L, -3L), (7L, -2L, -3L), (-7L, -2L, 3L), (7L, 2L, 3L),
    (-1L, 10L, 0L), (1L, -10L, 0L), (-9L, 3L, -3L), (-10L, 3L, -3L))

  test("Scala Long./ truncates toward zero on all sign combinations") {
    cases.foreach { case (a, b, want) => assert(a / b == want, s"$a / $b") }
  }

  test("Spark `div` matches Scala and measured DuckDB `//` exactly") {
    import spark.implicits._
    val got = cases.map { case (a, b, _) =>
      Seq((a, b)).toDF("a", "b")
        .selectExpr("a div b").as[Long].head()
    }
    assert(got == cases.map(_._3),
      s"Spark div drifted: got $got, want ${cases.map(_._3)}")
  }
}
