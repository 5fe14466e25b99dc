package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted text index — the retrieval counterpart of the
  * q184 dedup index and q185 IVF store: postings persisted AT REST,
  * bucketed by term, so keyword / phrase / BM25 queries are answered
  * from a term-pruned index scan and never re-tokenize the corpus.
  *
  * Tokenization is EXACTLY q63's (ScaleQueries.bm25): lowercase, split
  * on `[^a-z]+`, keep terms of length ≥ [[graft.queries.ScaleQueries
  * .MinTermLen]]. Positions are 1-based offsets into the RAW split
  * sequence (before the length filter), the Lucene position-increment
  * convention: dropped short tokens still advance the counter, so
  * phrase adjacency means textual adjacency and the on-disk index can
  * answer exact phrase queries.
  *
  * One row per (term, doc): `term, doc_id, tf, dl, positions` —
  * `tf = size(positions)` (occurrences of the term), `dl` the doc's
  * indexed-token count (the BM25 length norm, denormalized into every
  * posting the way Lucene stores norms per doc-in-segment so scoring
  * needs no second table). Corpus-level stats (`n_docs`, `avgdl`) are
  * segment metadata: a 1-row parquet beside the postings.
  *
  * Scale shape: building is one tokenize pass + one (term, doc)
  * aggregation — shuffle keyed by (term, doc_id), no collect. The
  * store is bucketed by term, so a query on k terms prunes to the
  * buckets those k terms hash into (≤ k of 8) and the per-term posting
  * lists arrive sorted by the bucket sort key. At 100 TB the posting
  * table shards across executors by term hash — exactly how a
  * distributed search engine partitions its term dictionary.
  */
object InvertedIndex {

  /** Raw tokens with 1-based positions over the unfiltered split
    * sequence, then filtered to indexable terms. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String,
      minTermLen: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z]+")).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("term"))
      .filter(length(col("term")) >= minTermLen)

  /** The postings rows: one per (term, doc) with tf, dl and sorted
    * positions. */
  def postingsDf(docs: DataFrame, idCol: String, textCol: String,
      minTermLen: Int): DataFrame = {
    val toks = tokens(docs, idCol, textCol, minTermLen)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    toks.groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tf", size(col("positions")).cast("long"))
      .join(dl, Seq("doc_id"))
      .select("term", "doc_id", "tf", "dl", "positions")
  }

  /** Segment metadata: `n_docs` counts ALL documents (q63's `N`, even
    * token-less ones); `avgdl` averages `dl` over docs that produced
    * at least one indexed token (q63 derives avgdl from the same
    * filtered token stream). Both are the exact doubles the full-scan
    * BM25 derives, so index-served scores are bitwise-reproducible. */
  def statsDf(docs: DataFrame, idCol: String, textCol: String,
      minTermLen: Int): DataFrame = {
    val spark = docs.sparkSession
    val n = docs.count().toDouble
    val avgdl = tokens(docs, idCol, textCol, minTermLen)
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(avg(col("dl"))).head().getDouble(0)
    import spark.implicits._
    Seq((n, avgdl)).toDF("n_docs", "avgdl")
  }

  /** MERGEABLE segment metadata — the Lucene-segment formulation of
    * [[statsDf]]: `(n_docs, n_indexed, sum_dl)` are integer partial
    * sums, so k segments' stats rows combine by addition into the
    * exact full-corpus `N` and `avgdl = Σ sum_dl / Σ n_indexed` with
    * no corpus re-scan. What makes incremental stats maintenance
    * (q197) exact rather than approximate. */
  def segmentStatsDf(docs: DataFrame, idCol: String, textCol: String,
      minTermLen: Int): DataFrame = {
    val spark = docs.sparkSession
    val n = docs.count()
    val r = tokens(docs, idCol, textCol, minTermLen)
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)).as("n_indexed"), sum(col("dl")).as("sum_dl"))
      .head()
    import spark.implicits._
    Seq((n, r.getLong(0), r.getLong(1))).toDF("n_docs", "n_indexed", "sum_dl")
  }
}
