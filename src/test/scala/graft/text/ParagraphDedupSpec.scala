package graft.text

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val s = spark
    import s.implicits._
    ParagraphDedup.keepFirst(rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("a repeated paragraph survives only at its first (doc, idx)") {
    val out = run(Seq(
      (1L, "alpha\nFOOTER"),
      (2L, "beta\nFOOTER"),
      (3L, "FOOTER\ngamma")))
    assert(out(1L) == ((2L, 2L, "alpha\nFOOTER")))
    assert(out(2L) == ((2L, 1L, "beta")))
    assert(out(3L) == ((2L, 1L, "gamma")))
  }

  test("duplicate paragraph within one document keeps the first position") {
    val out = run(Seq((7L, "x\ny\nx\nz")))
    assert(out(7L) == ((4L, 3L, "x\ny\nz")))
  }

  test("a document can lose everything; reassembly preserves order") {
    val out = run(Seq(
      (1L, "a\nb\nc"),
      (2L, "c\na"),
      (3L, "p\nq")))
    assert(out(1L) == ((3L, 3L, "a\nb\nc")))
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((2L, 2L, "p\nq")))
  }

  test("ties break by doc order then position") {
    // same paragraph at different positions of the same-numbered docs:
    // winner is (min doc, then min idx)
    val out = run(Seq(
      (5L, "u\nDUP"),
      (4L, "DUP\nv\nDUP")))
    assert(out(4L)._2 == 2L) // keeps DUP@0 (first) and v, drops DUP@2
    assert(out(4L)._3 == "DUP\nv")
    assert(out(5L) == ((2L, 1L, "u")))
  }

  test("plans winners+semi-join, not a window over the paragraph key") {
    val s = spark
    import s.implicits._
    val plan = ParagraphDedup
      .keepFirst(Seq((1L, "a\nb")).toDF("id", "text"), "id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
    Seq("ScalaUDF", "BatchEvalPython").foreach { bad =>
      assert(!plan.contains(bad), plan)
    }
  }
}
