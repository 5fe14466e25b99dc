package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.NgramLM

/** Exact duplicate-passage detection — the windowed-hash practical form
  * of exact-substring training-data dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): every
  * sliding W-token window is hashed, and a window is DUPLICATED when
  * its hash occurs at least twice anywhere in the corpus (within one
  * document or across documents). Per-document duplication profiles
  * drive span-level filtering, where whole-doc dedup (MinHash/SimHash)
  * cannot see a viral passage embedded in otherwise-unique pages.
  *
  * Scale shape (100 TB): text explodes into `(hash, doc_id)` pairs —
  * two narrow columns — which collapse map-side to per-(hash, doc)
  * counts before any shuffle; corpus-wide hash totals and the per-doc
  * roll-up both derive from that aggregate. Nothing is O(n²) and no
  * driver state exists. The physical plan deliberately RECOMPUTES the
  * explode on each side of the hash-total join rather than persisting
  * it: the per-window intermediate is O(corpus tokens) (~30 B/token —
  * far beyond any cache at 100 TB), the recompute is one scan + split
  * + md5, and Spark has no cross-branch CTE reuse to exploit anyway.
  * (A true suffix-array dedup finds arbitrary-length repeats but is a
  * single-machine construction; the fixed-W windowed form is the
  * standard distributed variant.)
  */
object DupPassages {

  /** Per-(window-hash, doc) occurrence counts: `(k, id, c)`. The md5 of
    * the space-rejoined window is engine-reproducible (lowercase hex in
    * both Spark and DuckDB). Docs shorter than `w` tokens yield no
    * rows. */
  def windowCounts(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    docs
      .select(col(idCol), NgramLM.tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= w)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(a) - $w + 1)," +
          s" i -> md5(array_join(slice(a, i, $w), ' ')))")).as("k"))
      .groupBy(col("k"), col(idCol))
      .agg(count(lit(1)).as("c"))

  /** Per-document duplication profile:
    * `(id, n_windows, n_dup_windows, n_crossdoc_windows)` where a dup
    * window's hash occurs ≥2 times corpus-wide and a cross-doc window's
    * hash occurs in ≥2 distinct documents. One hash-keyed shuffle
    * serves both statistics; `nd` is a plain `count` because
    * [[windowCounts]] is already distinct per (hash, doc). */
  def perDocStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val wc = windowCounts(docs, idCol, textCol, w)
    val kc = wc.groupBy("k").agg(
      sum(col("c")).as("cnt"), count(lit(1)).as("nd"))
    wc.join(kc, "k")
      .groupBy(idCol)
      .agg(
        sum(col("c")).as("n_windows"),
        sum(when(col("cnt") >= 2, col("c")).otherwise(0L)).as("n_dup_windows"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_crossdoc_windows"))
  }

  /** Token intervals covered by every REDUNDANT duplicated-window
    * occurrence under the canonical-first excision rule (Lee et al.
    * 2022's ExactSubstr policy, windowed form): a window occurrence
    * `(doc, p)` of hash `k` is redundant when `k` occurs ≥2 times
    * corpus-wide AND `(doc, p)` is not the lexicographically first
    * occurrence of `k` (min by `(doc_id, position)` — the one copy the
    * corpus keeps). Returns `(idCol, s, e)` 1-based inclusive token
    * intervals of width `w`.
    *
    * Scale shape: like [[windowCounts]], the per-occurrence table is
    * two narrow columns + position; the per-hash reduction
    * (`count` + `min(struct(doc, p))`) is a plain aggregate with
    * map-side partials — no per-hash sort, no window function on the
    * O(tokens) table. The explode is recomputed on both sides of the
    * hash join for the q101 reason (the intermediate is O(corpus
    * tokens) and far beyond any cache at 100 TB). */
  def redundantIntervals(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    def occurrences =
      docs
        .select(col(idCol), NgramLM.tokens(col(textCol)).as("a"))
        .filter(size(col("a")) >= w)
        .select(col(idCol), explode(expr(
          s"transform(sequence(1, size(a) - $w + 1), i -> named_struct(" +
            s"'p', i, 'k', md5(array_join(slice(a, i, $w), ' '))))")).as("o"))
        .select(col(idCol), col("o.p").as("p"), col("o.k").as("k"))
    val kc = occurrences.groupBy("k").agg(
      count(lit(1)).as("cnt"),
      min(struct(col(idCol), col("p"))).as("f"))
    occurrences.join(kc, "k")
      .filter(col("cnt") >= 2 &&
        !(col(idCol) === col(s"f.$idCol") && col("p") === col("f.p")))
      .select(col(idCol), col("p").as("s"), (col("p") + lit(w - 1)).as("e"))
  }
}
