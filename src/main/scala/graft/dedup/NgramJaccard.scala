package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.text.Hashing

/** Exact all-pairs character-n-gram Jaccard similarity join with
  * PREFIX + SIZE FILTERING (Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo
  * WWW'07 "all-pairs").
  *
  * The naive inverted-index join explodes on frequent n-grams
  * (sum over grams of df² rows — quadratic at 100 TB). Two exact
  * prunings keep the candidate set near-linear in true matches:
  *
  *  - prefix filter: order every doc's gram set by global document
  *    frequency (ties by gram); for |g| grams and threshold τ, any pair
  *    with jaccard ≥ τ must collide within the first
  *    `|g| − ⌈τ·|g|⌉ + 1` grams (overlap ≥ τ·|g| is implied by J ≥ τ);
  *  - size filter: J(A,B) ≥ τ ⇒ τ·|A| ≤ |B| ≤ |A|/τ, enforced inside
  *    the candidate join so mismatched-length docs never pair.
  *
  * Grams join on their 60-bit md5 hash, not the string — fixed-width
  * shuffle keys. One exact-verification join over full postings
  * follows; postings are cached because the DAG uses them three times
  * (df, prefix, verify).
  */
object NgramJaccard {

  /** Distinct (id, gram) postings. */
  def postings(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(Hashing.charNgrams(col(textCol), n)).as("gram"))

  /** Pairs (a < b) with exact n-gram Jaccard ≥ threshold.
    *
    * The returned plan reads persisted postings/prefix tables; callers
    * making repeated library calls should prefer [[similarPairsResult]]
    * and `release()` after the final action ([[graft.CachedResult]]). */
  def similarPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    similarPairsResult(docs, idCol, textCol, n, threshold).df

  /** [[similarPairs]] plus a release handle for the persisted postings
    * and prefix scratch tables. */
  def similarPairsResult(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): graft.CachedResult = {
    // Repartition by id BEFORE the shingling/hashing work: document
    // tables are tiny on disk (one input split) but explode ~100x in
    // compute, and AQE plans by bytes, not downstream CPU — without
    // this the gram/md5 pipeline runs on one core.
    val spread = graft.Partitioning.spread(docs, col(idCol))
    // eager (graft.Scratch.eager): four downstream exchanges read the
    // hashed postings (sizes, df, ranked, garr) — lazily persisted,
    // AQE's concurrent stage jobs raced recomputes of the gram+md5
    // subtree into the unfilled cache (the q184 cache-race finding)
    val post = graft.Scratch.eager(
      postings(spread, idCol, textCol, n)
        .select(col("id"), Hashing.h60(col("gram")).as("g")))
    val sizes = post.groupBy("id").agg(count(lit(1)).as("sz"))

    // global document frequency per gram — drives the rarest-first order
    val df = post.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = post.join(df, "g")
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("g"))))
      .join(sizes, "id")
    // prefix length: sz - ceil(τ·sz) + 1; eagerly persisted — both
    // sides of the candidate self-join read it (the window subtree is
    // expensive, and lazy it raced under AQE)
    val prefix = graft.Scratch.eager(ranked.filter(
        col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1))

    val pa = prefix.select(col("id").as("doc_a"), col("g"), col("sz").as("sz_a"))
    val pb = prefix.select(col("id").as("doc_b"), col("g"), col("sz").as("sz_b"))
    val cand = pa.join(pb, Seq("g"))
      .filter(col("doc_a") < col("doc_b") &&
        // size filter: τ·|A| ≤ |B| ≤ |A|/τ
        col("sz_b") * lit(threshold) <= col("sz_a") &&
        col("sz_a") * lit(threshold) <= col("sz_b"))
      .select("doc_a", "doc_b").distinct()

    // Exact verification via per-doc gram arrays, NOT by exploding
    // candidates against full postings — that costs |cand| ×
    // |grams/doc| join rows (measured 700M on a corpus of heavily-
    // overlapping docs where prefix+size filtering still leaves ~1.7M
    // candidates).
    // SORTED hashed-long gram arrays: intersection via the native
    // two-pointer codegen expression (graft.functions.ArrayOps) — the
    // boxed array_intersect hash path measured ~35 s on 1.7M pairs.
    // One sort per document amortizes over every pair it appears in.
    // Re-aggregated from the persisted hashed postings (a transform()
    // lambda would re-run md5 per element interpreted — see MinHashLSH).
    // Deliberately NO broadcast hint: at 100 TB the corpus's gram
    // arrays cannot ship to every executor. Both joins are plain id
    // equi-joins, so Catalyst/AQE broadcasts when `garr` is small and
    // shuffle-joins otherwise — then only candidates (≪ n²) and the
    // matching array rows cross the exchange.
    val garr = post.groupBy("id").agg(sort_array(collect_list(col("g"))).as("gr"))
    val ga = garr.toDF("doc_a", "gr_a")
    val gb = garr.toDF("doc_b", "gr_b")
    // candidates exit the distinct AQE-coalesced into ~1 partition
    // (28 MB of pairs) — respread so verification uses every core
    val out = graft.Partitioning.spread(cand, col("doc_a"))
      .join(ga, "doc_a").join(gb, "doc_b")
      .withColumn("inter",
        graft.functions.ArrayOps.sortedIntersectCount(col("gr_a"), col("gr_b"))
          .cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("gr_a")) + size(col("gr_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    graft.CachedResult(out, Seq(post, prefix))
  }

  /** Asymmetric CONTAINMENT join: ordered pairs (a, b), a ≠ b, with
    * `|A∩B| / |A| ≥ threshold` — "A is (mostly) quoted inside B". The
    * predicate quote/subset detection and decontamination generalize
    * to; symmetric Jaccard misses it whenever B is much larger than A.
    *
    * Filtering is asymmetric too: the contained side keeps its
    * rarest-first PREFIX (overlap ≥ τ·|A| must collide within A's
    * first |A| − ⌈τ·|A|⌉ + 1 grams), but the containing side indexes
    * ALL its grams — no size upper bound exists on B, only the lower
    * bound |B| ≥ τ·|A| (enforced in the candidate join). Verification
    * reuses the sorted-array native intersect. */
  /** The candidate stage of [[containmentPairsResult]] — all ordered
    * pairs surviving the asymmetric prefix + size + positional
    * filters, BEFORE exact verification. Exposed (package-private) so
    * the filter-safety property — candidates ⊇ true containment pairs,
    * i.e. the filters may only prune NON-matches — is testable per
    * stage (DedupSpec's randomized-corpora property), not just via the
    * end-to-end result. Returns (candidates, postings, scratch to
    * release). */
  private[graft] def containmentCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): (DataFrame, DataFrame, Seq[DataFrame]) = {
    val spread = graft.Partitioning.spread(docs, col(idCol))
    // eager persists (graft.Scratch.eager): same cache-race rationale
    // as similarPairsResult above
    val post = graft.Scratch.eager(
      postings(spread, idCol, textCol, n)
        .select(col("id"), Hashing.h60(col("gram")).as("g")))
    val sizes = post.groupBy("id").agg(count(lit(1)).as("sz"))
    val df = post.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = graft.Scratch.eager(post.join(df, "g")
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("g"))))
      .join(sizes, "id")) // both candidate sides
    val pa = ranked
      .filter(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("id").as("doc_a"), col("g"), col("sz").as("sz_a"))
    val pb = ranked.select(col("id").as("doc_b"), col("g"),
      col("sz").as("sz_b"), col("pos").as("pos_b"))
    val cand = pa.join(pb, Seq("g"))
      .filter(col("doc_a") =!= col("doc_b") &&
        col("sz_b") >= lit(threshold) * col("sz_a") &&
        // positional filter (PPJoin-style) on the CONTAINING side:
        // with both gram lists in the same global (df, g) order, an
        // overlap of ceil(τ·|A|) grams forces a collision within B's
        // first |B| − ⌈τ·|A|⌉ + 1 positions — prunes frequent-gram
        // matches deep inside large containers before the distinct
        col("pos_b") <= col("sz_b") - ceil(lit(threshold) * col("sz_a")) + 1)
      .select("doc_a", "doc_b").distinct()
    (cand, post, Seq(post, ranked))
  }

  def containmentPairsResult(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): graft.CachedResult = {
    val (cand, post, scratch) =
      containmentCandidates(docs, idCol, textCol, n, threshold)
    val garr = post.groupBy("id").agg(sort_array(collect_list(col("g"))).as("gr"))
    val out = graft.Partitioning.spread(cand, col("doc_a"))
      .join(garr.toDF("doc_a", "gr_a"), "doc_a")
      .join(garr.toDF("doc_b", "gr_b"), "doc_b")
      .withColumn("inter",
        graft.functions.ArrayOps.sortedIntersectCount(col("gr_a"), col("gr_b"))
          .cast("long"))
      .withColumn("containment",
        col("inter").cast("double") / size(col("gr_a")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 6).as("containment"))
    graft.CachedResult(out, scratch)
  }
}
