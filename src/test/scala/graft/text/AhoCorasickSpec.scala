package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The automaton contract q296 rides on: every-occurrence counts, and
  * equality with the naive (and SQL-oracle) non-overlapping count for
  * border-free patterns. */
class AhoCorasickSpec extends AnyFunSuite {

  private def naiveCount(text: String, p: String): Long = {
    var c = 0L
    var i = text.indexOf(p)
    while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
    c // counts ALL start positions (overlapping included)
  }

  private def hasBorder(p: String): Boolean =
    (1 until p.length).exists(l => p.take(l) == p.takeRight(l))

  test("gated lexicon is border-free (oracle-count equivalence holds)") {
    graft.queries.PipelineQueries.KeywordLexicon.foreach { kw =>
      assert(!hasBorder(kw), s"'$kw' has a border: replace-length " +
        "oracle would undercount vs the automaton")
    }
  }

  test("counts equal naive all-occurrences counts, multi-pattern") {
    val pats = Seq("ab", "abab", "ba", "c", "bc")
    val ac = new AhoCorasick(pats)
    val texts = Seq("ababab", "abc", "", "cccc", "bababab", "xyz",
      "abcabcbababc")
    texts.foreach { t =>
      val got = ac.counts(t)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naiveCount(t, p), s"pattern '$p' in '$t'")
      }
    }
  }

  test("overlapping patterns all fire at their end positions") {
    // "aaa" contains "aa" at starts 0 and 1 — the automaton reports both
    val ac = new AhoCorasick(Seq("aa"))
    assert(ac.counts("aaa")(0) == 2)
  }

  test("deterministic across instances and long inputs") {
    val pats = graft.queries.PipelineQueries.KeywordLexicon
    val text = Iterator.continually(
      "the fast scan joins a sort merge then a table scan merge join")
      .take(200).mkString(" ")
    val a = new AhoCorasick(pats).counts(text).toSeq
    val b = new AhoCorasick(pats).counts(text).toSeq
    assert(a == b)
    assert(a.sum > 0)
  }
}
