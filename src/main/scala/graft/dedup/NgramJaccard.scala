package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Hashing

/** Exact all-pairs character-n-gram Jaccard similarity join with
  * PREFIX FILTERING (Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo WWW'07
  * "all-pairs").
  *
  * The naive inverted-index join explodes on frequent n-grams
  * (sum over grams of df² rows — quadratic at 100 TB). Prefix filtering
  * keeps it EXACT while joining only on each document's rarest grams:
  * order every doc's gram set by global document frequency (ties by
  * gram text); for |g| grams and threshold τ, two docs with
  * jaccard ≥ τ must share a gram within each other's first
  * `|g| - ceil(τ·|g|) + 1` grams. Join on prefix grams only → candidate
  * pairs ~ linear in true matches; one exact-verification join follows.
  *
  * Everything is deterministic, so the DuckDB oracle can brute-force
  * the same answer at verification scale.
  */
object NgramJaccard {

  /** Distinct (id, gram) postings. */
  def postings(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(Hashing.charNgrams(col(textCol), n)).as("gram"))

  /** Pairs (a < b) with exact n-gram Jaccard ≥ threshold. */
  def similarPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val post = postings(docs, idCol, textCol, n)
    val sizes = post.groupBy("id").agg(count(lit(1)).as("sz"))

    // global document frequency per gram — drives the rarest-first order
    val df = post.groupBy("gram").agg(count(lit(1)).as("df"))
    val ranked = post.join(df, "gram")
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("gram"))))
      .join(sizes, "id")
    // prefix length: sz - ceil(τ·sz) + 1
    val prefix = ranked.filter(
      col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)

    val pa = prefix.select(col("id").as("doc_a"), col("gram"))
    val pb = prefix.select(col("id").as("doc_b"), col("gram"))
    val cand = pa.join(pb, Seq("gram")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

    // exact verification over the full postings of candidates only
    val fa = post.select(col("id").as("doc_a"), col("gram"))
    val fb = post.select(col("id").as("doc_b"), col("gram"))
    val inter = cand.join(fa, "doc_a").join(fb, Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
      .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
