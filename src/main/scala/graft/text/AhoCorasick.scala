package graft.text

/** Aho-Corasick multi-pattern matcher (Aho & Corasick 1975) — ONE pass
  * over the text finds every occurrence of every keyword, however many
  * keywords there are. This is the lexicon-tagging primitive of a
  * cleaning pipeline (PII term lists, brand lexicons, blocklists):
  * k independent `regexp`/`replace` scans cost O(k·n) per document and
  * k is 10⁴-10⁶ for real lexicons; the automaton costs O(n + matches)
  * regardless of k.
  *
  * Implementation: goto trie over the lexicon's characters, BFS-built
  * failure links, and per-node aggregated output counts via dictionary
  * links collapsed into a per-node pattern list (standard
  * construction). Matching counts every (end position, pattern) match
  * — for a pattern with no proper border (prefix = suffix) this equals
  * its non-overlapping occurrence count, which is what a SQL
  * `replace`-length oracle computes; the gated lexicon is chosen
  * border-free so both engines count the same thing.
  *
  * The automaton is plain serializable Scala (arrays + maps), built
  * once per partition from the broadcast lexicon and reused across the
  * partition's documents — the mapPartitions shape is deliberate: the
  * matcher is a stateful character-level scan no built-in Column
  * function expresses, and (like MediaCodec's byte decoders) the
  * correct Spark form is per-partition imperative code below a normal
  * DataFrame aggregation, never a driver loop. */
class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty))

  // trie: node 0 is the root; edges in a per-node char map
  private val next = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, i) =>
    var s = 0
    p.foreach { c =>
      s = next(s).getOrElseUpdate(c, {
        next += scala.collection.mutable.Map.empty[Char, Int]
        out += Nil
        next.size - 1
      })
    }
    out(s) ::= i
  }
  // BFS failure links; collapse dictionary links into out lists
  private val fail: Array[Int] = Array.fill(next.size)(0)
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach(q.enqueue)
    while (q.nonEmpty) {
      val u = q.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
        out(v) = out(v) ++ out(fail(v))
        q.enqueue(v)
      }
    }
  }

  /** Per-pattern occurrence counts in `text` (indexed like
    * `patterns`). */
  def counts(text: String): Array[Long] = {
    val acc = new Array[Long](patterns.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      out(s).foreach(p => acc(p) += 1)
      i += 1
    }
    acc
  }
}
