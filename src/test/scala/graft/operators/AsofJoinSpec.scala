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

  test("forward as-of: earliest right at-or-after each left row") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "late"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 7L, 0.7), (1L, 15L, 1.5), (1L, 20L, 2.0), (2L, 9L, 9.9))
      .toDF("k", "t", "v")
    val got = AsofJoin.forward(l, r, "k", "t",
        leftCols = Seq("k", "t", "tag"),
        rightPayload = Seq("t" -> "r_t", "v" -> "r_v"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3)),
        if (row.isNullAt(4)) None else Some(row.getDouble(4))))
      .toSet
    assert(got == Set(
      (1L, 10L, "a", Some(15L), Some(1.5)),   // earliest >= 10 is t=15
      (1L, 20L, "b", Some(20L), Some(2.0)),   // equal ts matches (>=)
      (1L, 25L, "late", None, None),          // nothing after -> NULL
      (2L, 10L, "c", None, None)))            // right at t=9 is before
  }

  test("forward tie-break picks the LOWEST sequence among equal-ts right rows") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1.0, 100L), (1L, 10L, 2.0, 200L))
      .toDF("k", "t", "v", "seq")
    val got = AsofJoin.forward(l, r, "k", "t",
        leftCols = Seq("k", "t", "tag"),
        rightPayload = Seq("v" -> "r_v"),
        tieBreak = Some("seq"))
      .head()
    assert(got.getDouble(3) == 1.0, s"lowest seq must win: $got")
  }

  test("property: random ties vs in-driver reference (dup (key,ts) right rows + tieBreak)") {
    // Seeded-random stand-in for scalacheck (offline cache). Small key
    // and ts domains force heavy (key, ts) collisions on BOTH sides —
    // the regime where the tieBreak contract (highest seq among
    // equal-ts right rows wins) is the only thing making the operator
    // deterministic. seq is the unique right row index, so the naive
    // reference's argmax is well-defined.
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(120)(
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toString))
      val right = Seq.tabulate(150)(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, rnd.nextDouble(), i.toLong))
      val expected = left.map { case (k, t, tag) =>
        val win = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._4)).lastOption
        (k, t, tag, win.map(_._2), win.map(_._3))
      }.sortBy(x => (x._1, x._2, x._3, x._4))
      val got = AsofJoin.backward(
          left.toDF("k", "t", "tag"),
          right.toDF("k", "t", "v", "seq"),
          "k", "t",
          leftCols = Seq("k", "t", "tag"),
          rightPayload = Seq("t" -> "r_t", "v" -> "r_v"),
          tieBreak = Some("seq"))
        .collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
          if (row.isNullAt(3)) None else Some(row.getLong(3)),
          if (row.isNullAt(4)) None else Some(row.getDouble(4))))
        .toSeq.sortBy(x => (x._1, x._2, x._3, x._4))
      assert(got == expected, s"seed $seed mismatch")
    }
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
