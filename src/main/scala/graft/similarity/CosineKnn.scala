package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * [[topK]] — exact brute-force cosine top-k for a (small) query set:
  * broadcast the queries, one scan of the corpus, per-query
  * `row_number` top-k. The 100 TB shape: the corpus is never shuffled,
  * the only exchange is the per-query partial top-k merge
  * (`TakeOrderedAndProject`-like via the window over query_id), and the
  * dot product stays inside whole-stage codegen via
  * `aggregate(zip_with(...))` — no UDF, no collect.
  *
  * [[IvfIndex]] — the approximate scale path: deterministic IVF
  * (inverted-file) coarse quantizer. Centroids = Lloyd iterations from
  * a deterministic seed sample; each corpus vector is assigned to its
  * nearest centroid (one narrow shuffle keyed by centroid); a query
  * probes only the `nprobe` nearest cells. Recall measured against
  * [[topK]] in the test suite.
  */
object CosineKnn {

  /** Cosine similarity of two double-array columns, computed
    * element-sequentially (deterministic summation order — matches the
    * DuckDB oracle's list_cosine_similarity). Native codegen expression:
    * the equivalent `aggregate(zip_with(...))` formulation runs
    * interpreted (Spark higher-order functions have no codegen) and was
    * 20x slower on 12.5M-pair scans. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.ArrayOps.cosine_column(a, b)

  /** Vectorized float[]→double[] cast. NOT `transform(c, _.cast("double"))`:
    * higher-order functions run interpreted (per-element lambda dispatch),
    * while a whole-array `Cast` is a single codegen'd expression — this
    * sits in every similarity hot path (q13/q24/q25 corpus scans). */
  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors (excluding self) for each query vector.
    * Output: (query_id, rank, neighbor_id, cos). */
  def topK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    // corpus repartition: embedding tables are one input split but the
    // scan does |queries| cosines per row — spread it across cores
    val c = graft.Partitioning.spread(corpus, col(idCol)).select(col(idCol).as("neighbor_id"),
      toDoubleArray(col(vecCol)).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleArray(col(vecCol)).as("qvec"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding-space
    * near-duplicate detection. Exact; blocked crossJoin. Quadratic by
    * construction: use only when the corpus fits the O(n²) budget or
    * exactness is non-negotiable. The scale path is
    * [[IvfIndex.nearDupCandidates]] → [[verifyPairs]]. */
  def nearDuplicatePairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = graft.Partitioning.spread(corpus, col(idCol))
      .select(col(idCol).as("doc_a"), toDoubleArray(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("doc_b"), toDoubleArray(col(vecCol)).as("vb"))
    a.crossJoin(broadcast(b)).filter(col("doc_a") < col("doc_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cos"))
  }

  /** Verify candidate pairs against the real vectors: equi-join
    * `candidates(doc_a, doc_b)` back to the corpus by id on each side,
    * compute the exact cosine, keep pairs ≥ threshold.
    *
    * Deliberately no `broadcast()` hint on the corpus: at 100 TB the
    * corpus cannot be broadcast, and both joins are plain equi-joins on
    * the id, so Catalyst/AQE picks broadcast when the corpus happens to
    * be small and shuffle-hash/sort-merge when it is not. The candidate
    * table (output of a blocked generator, ≪ n²) is the only thing that
    * moves twice. */
  def verifyPairs(
      candidates: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val va = corpus.select(col(idCol).as("doc_a"), toDoubleArray(col(vecCol)).as("va"))
    val vb = corpus.select(col(idCol).as("doc_b"), toDoubleArray(col(vecCol)).as("vb"))
    candidates.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cos"))
  }
}
