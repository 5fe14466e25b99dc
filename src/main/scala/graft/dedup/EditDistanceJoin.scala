package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join by deletion neighborhoods (FastSS /
  * SymSpell scheme) — record linkage for near-identical identifiers
  * (names, SKUs, URLs) without the O(n²) pair scan.
  *
  * Two distinct strings at Levenshtein distance ≤ 1 ALWAYS share an
  * element of their deletion neighborhoods (the string itself plus
  * every single-character deletion): a substitution at position i
  * means deleting i from both sides yields the same string; an
  * insertion/deletion pair means the shorter string IS a deletion
  * variant of the longer. So an inverted index keyed by the ≤ L+1
  * variants per string turns the join into candidates-then-verify —
  * the same discipline as every other blocking family here (LSH
  * bands, SimHash chunks, n-gram prefixes): generate, equi-join,
  * verify with the exact `levenshtein` (built-in, codegen).
  *
  * At 100 TB: the index is O(n·L) rows of short strings, the join is
  * a plain hash-partitioned equi-join on the variant, and group sizes
  * are bounded by the alphabet (a variant is shared only by strings
  * agreeing everywhere else). Distance k = 2 ([[selfJoinEd2]]) uses the
  * 2-deletion neighborhood (size ~L²/2 per string — the documented L^k
  * growth, which is why k stays small): if ed(a,b) ≤ k, aligning a and
  * b and deleting from `a` the chars aligned to substitutions/deletions
  * (≤ k) and from `b` those aligned to substitutions/insertions (≤ k)
  * reaches a common string, so the ≤k-deletion neighborhoods intersect
  * — the SymSpell guarantee, giving perfect recall before the exact
  * verify.
  *
  * Variant generation is pure built-in string arithmetic over an
  * exploded position sequence (no higher-order-function lambda, no
  * UDF — the whole candidate pipeline stays in whole-stage codegen).
  */
object EditDistanceJoin {

  /** All pairs (idA < idB) with `levenshtein(strA, strB) <= 1` from a
    * self-join of `df` — exact, via the deletion-neighborhood index.
    *
    * Shuffle economy: the equi-join key is `xxhash64(variant)` — 8
    * bytes instead of an L-char string — which is safe because every
    * candidate is re-verified with the exact `levenshtein` BEFORE the
    * dedup, so a hash collision only costs one wasted comparison, never
    * a wrong pair. Verification runs pre-`distinct` (codegen'd
    * levenshtein on the joined rows is cheaper than shuffling the
    * strings), so the final distinct dedups two longs, nothing more. */
  def selfJoinEd1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val v = df
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__d", explode(sequence(lit(0), length(col("__s")))))
      // Run dedup: deleting any character of a run of equal characters
      // yields the same variant (think the zero-run in "Customer#000001234"
      // — without this, each name emits k identical index rows and the
      // join multiplies k_a * k_b duplicates per candidate pair). Keep
      // only the FIRST deletion of each run — a codegen filter, no
      // shuffle, and provably the same variant set.
      .filter(col("__d") <= 1 ||
        col("__s").substr(col("__d") - 1, lit(1)) =!=
          col("__s").substr(col("__d"), lit(1)))
      .select(col("__id"), col("__s"),
        xxhash64(when(col("__d") === 0, col("__s"))
          .otherwise(concat(
            col("__s").substr(lit(1), col("__d") - 1),
            col("__s").substr(col("__d") + 1, length(col("__s"))))))
          .as("__vh"))
    // eager (graft.Scratch.eager): both join sides read the variant
    // index, and the rename-only projections above the sides defeat
    // exchange reuse — uncached, the explode + string pipeline ran
    // twice per action (and raced under AQE's concurrent stage jobs)
    val vc = graft.Scratch.eager(v)
    val a = vc.select(col("__vh"), col("__id").as("id_a"), col("__s").as("s_a"))
    val b = vc.select(col("__vh"), col("__id").as("id_b"), col("__s").as("s_b"))
    a.join(b, "__vh")
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("s_a"), col("s_b")) <= 1)
      .select("id_a", "id_b")
      .distinct()
  }

  /** All pairs (idA < idB) with `levenshtein(strA, strB) <= 2` — exact,
    * via the 2-deletion-neighborhood index (see the class doc for the
    * recall guarantee).
    *
    * A variant is "delete the chars at original 1-based positions
    * (d1, d2)", encoded (0,0) = the string itself, (p,0) = one
    * deletion, (p,q) p<q = two. Deletion positions are canonicalized
    * to the FIRST position of each run of equal characters (deleting
    * any char of a run yields the same string), which collapses the
    * digit-run blowup of id-like strings; the second position
    * additionally keeps q = p+1 so two deletions inside one run
    * (e.g. both zeros of "00") still have a representative. The
    * canonical form always survives the filters, so no variant — and
    * hence no true pair — is lost; surviving duplicates only cost a
    * wasted join row, and verification + distinct remove them from the
    * output. Verification uses the bounded `levenshtein(_, _, 2)`
    * (early-exit codegen) so each candidate costs O(L·k), not O(L²). */
  def selfJoinEd2(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
    val v = base
      .withColumn("__d1", explode(sequence(lit(0), length(col("__s")))))
      .filter(col("__d1") <= 1 ||
        col("__s").substr(col("__d1") - 1, lit(1)) =!=
          col("__s").substr(col("__d1"), lit(1)))
      // second deletion: 0 (none), or a position AFTER d1 — d1=0 (no
      // first deletion) forces d2=0 so (0,q) never duplicates (q,0)
      .withColumn("__d2", explode(sequence(lit(0),
        when(col("__d1") === 0, lit(0)).otherwise(length(col("__s"))))))
      .filter(col("__d2") === 0 ||
        (col("__d2") > col("__d1") &&
          (col("__d2") === col("__d1") + 1 ||
            col("__s").substr(col("__d2") - 1, lit(1)) =!=
              col("__s").substr(col("__d2"), lit(1)))))
      .select(col("__id"), col("__s"),
        xxhash64(
          when(col("__d1") === 0, col("__s"))
            .when(col("__d2") === 0, concat(
              col("__s").substr(lit(1), col("__d1") - 1),
              col("__s").substr(col("__d1") + 1, length(col("__s")))))
            .otherwise(concat(
              col("__s").substr(lit(1), col("__d1") - 1),
              col("__s").substr(col("__d1") + 1, col("__d2") - col("__d1") - 1),
              col("__s").substr(col("__d2") + 1, length(col("__s"))))))
          .as("__vh"))
      // different (d1,d2) of ONE string can reach the same variant
      // (e.g. "aba": delete {1,2} and {2,3} both yield "a") — dedup
      // per string before the join so index-side duplicates can't
      // multiply into k_a*k_b candidate copies
      .dropDuplicates("__id", "__vh")
    // eager: same two-sided-read rationale as selfJoinEd1
    val vc = graft.Scratch.eager(v)
    val a = vc.select(col("__vh"), col("__id").as("id_a"), col("__s").as("s_a"))
    val b = vc.select(col("__vh"), col("__id").as("id_b"), col("__s").as("s_b"))
    a.join(b, "__vh")
      // bounded levenshtein returns -1 ABOVE the threshold, so the
      // within-bound test is >= 0, not <= 2
      .filter(col("id_a") < col("id_b") &&
        expr("levenshtein(s_a, s_b, 2)") >= 0)
      .select("id_a", "id_b")
      .distinct()
  }
}
