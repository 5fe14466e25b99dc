package graft.text

/** Exact BPE merge learning over a word-frequency dictionary (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", ACL'16 — the `get_stats`/`merge_vocab` recurrence): start
  * from character symbols, repeatedly count adjacent symbol pairs
  * weighted by word frequency (OVERLAPPING occurrences count — 'aaa'
  * contributes (a,a) twice, the reference implementation's behavior)
  * and merge the most frequent pair greedily left-to-right in every
  * word. Ties break on (count desc, left asc, right asc) so the merge
  * sequence is a pure function of the dictionary.
  *
  * This is the VOCAB-BOUNDED half of BPE training: the corpus-scale
  * work (one scan → word counts → top-V dictionary) happens in Spark;
  * this recurrence runs on ≤V words of driver state — the q131
  * planner / q136 CDF pattern. The same recurrence is mirrored as
  * unrolled SQL by [[mergeIterationSql]] for the DuckDB gate.
  */
object BpeLearner {

  /** One learned merge: the pair picked at `step` and its weighted
    * count at pick time. */
  final case class Merge(step: Long, left: String, right: String, count: Long)

  /** Run `k` merges over `dict` (word → frequency). */
  def learn(dict: Seq[(String, Long)], k: Int): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] =
      dict.map { case (w, n) => (w.map(_.toString).toVector, n) }
    (1 to k).flatMap { step =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) Nil
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        words = words.map { case (syms, n) => (mergeWord(syms, a, b), n) }
        Seq(Merge(step.toLong, a, b, c))
      }
    }
  }

  /** Greedy left-to-right merge of adjacent (a, b) in one word —
    * within a run of overlapping matches the 1st, 3rd, … are taken
    * (the parity rule the SQL mirror uses). */
  def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** SQL expression applying `merges` in order to a delimited symbol
    * string (`__a__b__c__`, built by `'__' || regexp_replace(word,
    * '(.)', '$1__')`): each merge is one LITERAL left-to-right
    * `replace` — the consumed trailing `_` forbids an overlapping
    * re-match (the [[mergeWord]] run-parity rule), and full `__`
    * brackets around symbols make mid-symbol false matches impossible
    * while merges consume only single `_`s. Valid in both Spark SQL
    * and DuckDB; symbols are [a-z]+ so no escaping is needed. */
  def applySql(merges: Seq[Merge], expr: String): String =
    merges.foldLeft(expr) { (acc, m) =>
      s"replace($acc, '_${m.left}__${m.right}_', '_${m.left}${m.right}_')"
    }

  /** Token count of a delimited symbol string `s`:
    * `len(s) − len(replace(s, '__', '_')) − 1` (n tokens ⇒ n+1 `__`
    * separators). */
  def tokenCountSql(s: String): String =
    s"length($s) - length(replace($s, '__', '_')) - 1"

  /** Driver-side reference: segment `word` by applying `merges` in
    * order (for equivalence specs against [[applySql]]). */
  def segment(word: String, merges: Seq[Merge]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { (syms, m) =>
      mergeWord(syms, m.left, m.right)
    }

  /** SQL (DuckDB) for merge iteration `t`: reads segmentation CTE
    * `p{t-1}`(word, cnt, i, sym), defines `best{t}`(a, b, pc) — the
    * pair picked at step t — and `p{t}`, the re-segmented state.
    * Greedy-leftmost overlap resolution is the parity rule: within
    * each maximal run of consecutive matched positions, odd ranks are
    * taken; a position is consumed (dropped) iff its predecessor was
    * taken. */
  def mergeIterationSql(t: Int): String = {
    val p0 = s"p${t - 1}"
    s"""pc$t AS (
       |  SELECT sym AS a, lead(sym) OVER (PARTITION BY word ORDER BY i) AS b, cnt
       |  FROM $p0),
       |pcc$t AS (
       |  SELECT a, b, sum(cnt)::BIGINT AS pc FROM pc$t
       |  WHERE b IS NOT NULL GROUP BY a, b),
       |best$t AS (SELECT a, b, pc FROM pcc$t ORDER BY pc DESC, a, b LIMIT 1),
       |mt$t AS (
       |  SELECT p.word, p.cnt, p.i, p.sym,
       |    lead(p.sym) OVER (PARTITION BY p.word ORDER BY p.i) AS nxt,
       |    (p.sym = b.a AND
       |     lead(p.sym) OVER (PARTITION BY p.word ORDER BY p.i)
       |       IS NOT DISTINCT FROM b.b) AS mtch
       |  FROM $p0 p CROSS JOIN best$t b),
       |rg$t AS (
       |  SELECT *, CASE WHEN mtch THEN i - row_number()
       |    OVER (PARTITION BY word, mtch ORDER BY i) END AS grp
       |  FROM mt$t),
       |tk$t AS (
       |  SELECT *, CASE WHEN mtch THEN (row_number()
       |    OVER (PARTITION BY word, grp ORDER BY i) % 2 = 1)
       |    ELSE FALSE END AS taken
       |  FROM rg$t),
       |np$t AS (
       |  SELECT word, cnt, i,
       |    CASE WHEN taken THEN sym || nxt ELSE sym END AS sym, taken,
       |    lag(taken) OVER (PARTITION BY word ORDER BY i) AS prev_taken
       |  FROM tk$t),
       |p$t AS (
       |  SELECT word, cnt,
       |    row_number() OVER (PARTITION BY word ORDER BY i) AS i, sym
       |  FROM np$t WHERE prev_taken IS NULL OR NOT prev_taken)""".stripMargin
  }
}
