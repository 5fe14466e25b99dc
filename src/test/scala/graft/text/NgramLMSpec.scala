package graft.text

import graft.SparkSpec
import graft.dedup.DupPassages
import graft.queries.CurationQueries

class NgramLMSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigram model counts and integer-micronat scores match a driver recompute") {
    // reference: "a b a b a" -> bigrams ab, ba, ab, ba -> c2(a,b)=2, c2(b,a)=2,
    // c1(a)=2, c1(b)=2, V=2
    val ref = docs(0L -> "a b a b a")
    val m = NgramLM.train(ref, "doc_id", "text")
    val c2 = m.c2.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(c2 == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
    assert(m.vocab == 2L)

    // scored doc "a b c": term(a,b) = ln(c1(a)+V) - ln(c2(a,b)+1) = ln(4)-ln(3);
    // term(b,c) unseen pair, seen left: ln(4)-ln(1)
    val scored = NgramLM.scoreMicronats(docs(7L -> "a b c"), m, "doc_id", "text")
      .collect().head
    val expected =
      math.round(1e6 * (math.log(4) - math.log(3))) +
        math.round(1e6 * (math.log(4) - math.log(1)))
    assert(scored.getLong(1) == 2L)
    assert(scored.getLong(2) == expected)

    // fully-OOV doc: every term is ln(0 + V) - ln(0 + 1) = ln(2)
    val oov = NgramLM.scoreMicronats(docs(8L -> "x y z"), m, "doc_id", "text")
      .collect().head
    assert(oov.getLong(2) == 2 * math.round(1e6 * math.log(2)))
  }

  test("q100: every document scored, scores positive, filter keeps AND drops") {
    val rows = CurationQueries.lmPerplexity(spark, sfDir).collect()
    val nDocs = graft.queries.QueryUtil.table(spark, sfDir, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (nb, nll) = (r.getLong(2), r.getLong(3))
      assert(nb > 0 == nll > 0, s"doc ${r.getLong(0)}")
      if (nb > 0) assert(r.getLong(4) == nll / nb)
    }
    val kept = rows.count(_.getBoolean(5))
    assert(kept > 0 && kept < rows.length,
      s"filter must both keep and drop (kept $kept of ${rows.length})")
  }

  test("duplicate passages: shared, repeated, and unique spans are told apart") {
    val w = 4
    val shared = "p q r s" // the duplicated 4-token passage
    val corpus = docs(
      1L -> s"u1 u2 u3 $shared v1 v2 v3", // shares with doc 2
      2L -> s"w1 w2 $shared x1",          // shares with doc 1
      3L -> s"m1 m2 $shared y1 $shared",  // within-doc repeat + cross-doc
      4L -> "z1 z2 z3 z4 z5 z6")          // fully unique
    val got = DupPassages.perDocStats(corpus, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 7 windows of width 4 over 10 tokens... tokens=10 -> 7 windows;
    // exactly one window IS the shared passage
    assert(got(1L)._1 == 7 && got(1L)._2 == 1 && got(1L)._3 == 1)
    assert(got(2L)._1 == 4 && got(2L)._2 == 1 && got(2L)._3 == 1)
    // doc 3: both copies of the passage count as duplicated occurrences
    assert(got(3L)._2 == 2 && got(3L)._3 == 2)
    assert(got(4L) == ((3L, 0L, 0L)))
  }

  test("within-doc-only repetition is dup but not cross-doc") {
    val corpus = docs(5L -> "a b c d e a b c d f")
    val r = DupPassages.perDocStats(corpus, "doc_id", "text", 4).collect().head
    // windows "a b c d" occurs at positions 1 and 6 -> 2 dup occurrences
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L)
  }

  test("q101: fixture has cross-doc duplicate passages; profile is consistent") {
    val rows = CurationQueries.dupPassages(spark, sfDir).collect()
    val nDocs = graft.queries.QueryUtil.table(spark, sfDir, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (nw, nd, nc, pm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd <= nw && nc <= nd, s"doc ${r.getLong(0)}")
      if (nw > 0) assert(pm == 1000 * nd / nw) else assert(pm == 0)
    }
    val dupDocs = rows.count(_.getLong(2) > 0)
    assert(dupDocs > 0 && dupDocs < rows.length,
      s"injected near-duplicates must surface ($dupDocs of ${rows.length})")
  }

  test("q100/q101 plans: no UDF, no cartesian, corpus joins are as declared") {
    val plans = Seq(
      CurationQueries.lmPerplexity(spark, sfDir),
      CurationQueries.dupPassages(spark, sfDir))
    plans.foreach { df =>
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("ScalaUDF"), "codegen surface must stay UDF-free")
      assert(!s.contains("CartesianProduct"))
    }
    // model joins broadcast (the LM is vocabulary-bounded)
    val lm = CurationQueries.lmPerplexity(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(lm.contains("BroadcastHashJoin"), lm.take(2000))
  }
}
