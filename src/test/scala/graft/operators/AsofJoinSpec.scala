package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def run(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, Double)],
      tieBreak: Option[String] = None) = {
    val s = spark
    import s.implicits._
    val l = left.toDF("k", "t", "tag")
    val r = right.toDF("k", "t", "v")
    AsofJoin.backward(l, r, "k", "t",
        leftCols = Seq("k", "t", "tag"),
        rightPayload = Seq("t" -> "r_t", "v" -> "r_v"),
        tieBreak = tieBreak)
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3)),
        if (row.isNullAt(4)) None else Some(row.getDouble(4))))
      .toSet
  }

  test("backward as-of: latest right at-or-before each left row") {
    val got = run(
      left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 10L, "c")),
      right = Seq((1L, 7L, 0.7), (1L, 20L, 2.0), (1L, 15L, 1.5), (2L, 11L, 9.9)))
    assert(got == Set(
      (1L, 5L, "early", None, None),          // no right row yet -> NULL
      (1L, 10L, "a", Some(7L), Some(0.7)),    // latest <= 10 is t=7
      (1L, 20L, "b", Some(20L), Some(2.0)),   // equal ts matches (<=)
      (2L, 10L, "c", None, None)))            // right at t=11 is after
  }

  test("tie-break picks the highest sequence among equal-ts right rows") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1.0, 100L), (1L, 10L, 2.0, 200L))
      .toDF("k", "t", "v", "seq")
    val got = AsofJoin.backward(l, r, "k", "t",
        leftCols = Seq("k", "t", "tag"),
        rightPayload = Seq("v" -> "r_v"),
        tieBreak = Some("seq"))
      .head()
    assert(got.getDouble(3) == 2.0, s"highest seq must win: $got")
  }

  test("plan: one hash shuffle on the key, no join operator") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 7L, 0.7)).toDF("k", "t", "v")
    val p = AsofJoin.backward(l, r, "k", "t",
        leftCols = Seq("k", "t", "tag"),
        rightPayload = Seq("v" -> "r_v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected exactly 1 hash shuffle, got $shuffles:\n$p")
  }
}
