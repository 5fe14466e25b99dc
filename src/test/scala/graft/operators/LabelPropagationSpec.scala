package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LPA semantics: communities denser than components, deterministic
  * min-label tie-break, fixed-round contract. */
class LabelPropagationSpec extends SparkSpec {

  private def arcs(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge split into two communities") {
    // triangle {1,2,3}, triangle {4,5,6}, bridge 3-4: a single
    // connected COMPONENT, two LPA communities — the distinction the
    // operator exists for
    val e = arcs((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val l = labelsOf(LabelPropagation.run(e, 4))
    assert(l(1) == l(2) && l(2) == l(3), s"left triangle split: $l")
    assert(l(4) == l(5) && l(5) == l(6), s"right triangle split: $l")
    assert(l(1) != l(4), s"bridge merged the triangles: $l")
    // one component — CC would give a single label
    val cc = ConnectedComponents.components(
        e.toDF("doc_a", "doc_b"), "doc_a", "doc_b", partitions = 4)
      .select("comp").distinct().count()
    assert(cc == 1)
  }

  test("min-label tie break is deterministic") {
    // node 3 sees neighbors 1 and 2 once each (tie) -> adopts label 1
    val e = arcs((1L, 3L), (2L, 3L))
    val round1 = labelsOf(LabelPropagation.run(e, 1))
    assert(round1(3) == 1L)
  }

  test("round state is a pure function of the previous round") {
    val e = arcs((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L),
      (2L, 4L))
    val a = labelsOf(LabelPropagation.run(e, 4))
    val b = labelsOf(LabelPropagation.run(e, 4))
    assert(a == b)
  }
}
