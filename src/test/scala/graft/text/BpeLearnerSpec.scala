package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeLearnerSpec extends AnyFunSuite {

  test("overlapping pairs count per position and merge greedy-leftmost") {
    // 'aaa' ×2: pair (a,a) occurs at two positions → weight 4; beats (a,b)
    val m = BpeLearner.learn(Seq("aaa" -> 2L, "ab" -> 1L), 3)
    assert(m.map(x => (x.step, x.left, x.right, x.count)) == Seq(
      (1L, "a", "a", 4L),    // merge a+a; aaa → [aa, a] (parity rule)
      (2L, "aa", "a", 2L),   // then aa+a; aaa → [aaa]
      (3L, "a", "b", 1L)))   // only ab remains pairable
  }

  test("tie-break is (count desc, left, right)") {
    val m = BpeLearner.learn(Seq("cd" -> 1L, "ab" -> 1L), 1)
    assert(m.head.left == "a" && m.head.right == "b")
  }

  test("mergeWord: run parity — 1st and 3rd overlapping matches taken") {
    assert(BpeLearner.mergeWord(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    assert(BpeLearner.mergeWord(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(BpeLearner.mergeWord(Vector("x", "a", "b", "a", "b"), "a", "b") ==
      Vector("x", "ab", "ab"))
  }

  test("merges compose: a learned symbol participates in later pairs") {
    // er then m+er — the q144 sf0.01 shape: later steps must see merged
    // symbols as atomic units
    val m = BpeLearner.learn(Seq("mer" -> 3L, "er" -> 2L), 2)
    assert(m(0).left == "e" && m(0).right == "r" && m(0).count == 5L)
    assert(m(1).left == "m" && m(1).right == "er" && m(1).count == 3L)
  }

  test("runs dry on single-symbol words") {
    assert(BpeLearner.learn(Seq("ab" -> 1L), 5).size == 1)
  }
}

/** The q145 replace-chain is a different MACHINE for the same rule —
  * prove expression-vs-driver equivalence on adversarial words. */
class BpeApplySpec extends graft.SparkSpec {

  test("replace-chain segmentation equals BpeLearner.segment, word for word") {
    import spark.implicits._
    val merges = Seq(
      BpeLearner.Merge(1, "a", "a", 0), BpeLearner.Merge(2, "aa", "a", 0),
      BpeLearner.Merge(3, "a", "b", 0), BpeLearner.Merge(4, "e", "r", 0),
      BpeLearner.Merge(5, "m", "er", 0))
    val words = Seq("aaaa", "aaa", "aaaaa", "abab", "aab", "baa",
      "mererer", "merger", "hammer", "a", "b", "zzz", "ababab", "aabaab")
    val applied = BpeLearner.applySql(merges, "s")
    val got = words.toDF("word")
      .selectExpr("word",
        "'__' || regexp_replace(word, '(.)', '$1__') AS s")
      .selectExpr("word",
        s"CAST(${BpeLearner.tokenCountSql(applied)} AS BIGINT) AS t",
        applied + " AS seg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    got.foreach { case (word, t, seg) =>
      val want = BpeLearner.segment(word, merges)
      assert(t == want.length.toLong, s"$word: $seg vs $want")
      // the delimited string decodes to exactly the reference segments
      assert(seg.split("__").filter(_.nonEmpty).toVector == want,
        s"$word: $seg vs $want")
    }
  }
}
