package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic IVF (inverted-file) approximate nearest neighbor.
  *
  * Coarse quantizer: nlist centroids trained with a few Lloyd
  * iterations, initialized from a deterministic id-ordered sample (no
  * RNG — reproducible across runs and engines). The corpus is then
  * partitioned by nearest-centroid cell; a query scans only its
  * `nprobe` closest cells.
  *
  * Scale notes: training collects only `nlist·dim` doubles to the
  * driver (tiny); assignment is one broadcast of the centroid table +
  * one narrow scan; the search joins each query to `nprobe` cells —
  * the shuffle is keyed by cell id, so a 1000-executor cluster probes
  * cells in parallel and never materializes all-pairs. Recall vs
  * [[CosineKnn.topK]] is asserted in the test suite (approximate by
  * design ⇒ driver records a rows-only check, not a DuckDB hash).
  */
object IvfIndex {

  /** L2-normalize then average — centroid update for cosine geometry. */
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Train nlist centroids with `iters` Lloyd iterations. Deterministic:
    * init = the nlist smallest-id vectors, or with `spreadInit` the
    * nlist smallest by `xxhash64(id)` — a deterministic pseudo-random
    * spread over the corpus. Id-ordered init seeds adjacent ids, which
    * on a corpus with id-correlated structure (e.g. grouped variants)
    * collapses the initial centroids into a few regions; hash order
    * breaks the correlation without collecting anything beyond the
    * nlist seeds (a `TakeOrdered` at any scale). Returns the centroid
    * table. */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3, spreadInit: Boolean = false): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus
      .select(col(idCol).cast("long").as("id"),
        CosineKnn.toDoubleArray(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
    val seed =
      if (spreadInit) ds.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
      else ds.orderBy("id").limit(nlist)
    var centroids = seed.collect().map(t => normalize(t._2))
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // sum + count per nearest cell — one partial-agg shuffle of nlist rows
      val sums = ds.mapPartitions { it =>
        val cs = bc.value
        it.map { case (_, v) =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val s = cosineArr(cs(c), v)
            if (s > bestSim) { bestSim = s; best = c }
            c += 1
          }
          (best, (v, 1L))
        }
      }.rdd.reduceByKey {
        (p1: (Array[Double], Long), p2: (Array[Double], Long)) =>
          val s = new Array[Double](p1._1.length)
          var i = 0
          while (i < p1._1.length) { s(i) = p1._1(i) + p2._1(i); i += 1 }
          (s, p1._2 + p2._2)
      }.collect()
      val next = centroids.clone()
      sums.foreach { case (cell, (s, n)) =>
        next(cell) = normalize(s.map(_ / n.toDouble))
      }
      centroids = next
      bc.destroy()
    }
    centroids
  }

  /** Corpus with an assigned `cell` column — a pure argmax projection
    * via the native [[graft.functions.VectorOps.nearest_cells]]
    * expression: no ×nlist crossJoin row blowup, no per-id window
    * shuffle. Assignment is a map over the scan at any scale. */
  def assign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val v = CosineKnn.toDoubleArray(col(vecCol))
    corpus.select(col(idCol), col(vecCol),
      element_at(graft.functions.VectorOps.nearest_cells(v, centroids, 1), 1)
        .as("cell"))
  }

  /** Candidate near-duplicate pairs via multi-probe cell blocking:
    * every vector posts to its `nprobe` nearest cells; any two vectors
    * sharing a posted cell are candidates. The only pairwise step is
    * the postings self-join keyed by cell — never O(n²) when the data
    * clusters tighter than the cell diameter. Verify candidates with
    * [[CosineKnn.verifyPairs]] (shuffle join, no corpus broadcast).
    *
    * Recall is data-dependent: sound for high thresholds on clustered
    * corpora (near-dup cos ≫ inter-cluster cos). Measured on the
    * synthetic embeddings at threshold 0.4 (a gradual similarity tail,
    * no cluster gap): recall 1.0 needs nprobe≈6 of nlist=16, at which
    * point candidates cover ~97% of all pairs — for that regime use
    * the exact blocked [[CosineKnn.nearDuplicatePairs]] instead. The
    * recall/candidate trade is asserted in SimilaritySpec. */
  def nearDupCandidates(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val v = CosineKnn.toDoubleArray(col(vecCol))
    val posts = corpus.select(col(idCol).as("id"),
      explode(graft.functions.VectorOps.nearest_cells(v, centroids, nprobe))
        .as("cell"))
    val l = posts.toDF("doc_a", "cell")
    val r = posts.toDF("doc_b", "cell")
    l.join(r, Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Approximate top-k: probe the nprobe nearest cells per query.
    * Output schema matches [[CosineKnn.topK]].
    *
    * Probe selection is the same [[graft.functions.VectorOps.nearest_cells]]
    * projection as [[assign]] (one row per (query, probed cell) via
    * explode) — no query×centroid crossJoin, no ranking window. The only
    * window left is the per-query top-k merge itself, partitioned by
    * query_id, which is the operator's semantics. */
  def search(
      assigned: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, centroids: Array[Array[Double]],
      k: Int, nprobe: Int): DataFrame = {
    val qv = CosineKnn.toDoubleArray(col(vecCol))
    val probes = queries.select(
      col(idCol).as("query_id"), qv.as("qvec"),
      explode(graft.functions.VectorOps.nearest_cells(qv, centroids, nprobe))
        .as("cell"))
    val corpus = assigned.select(col(idCol).as("neighbor_id"),
      CosineKnn.toDoubleArray(col(vecCol)).as("cvec2"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", CosineKnn.cosine(col("qvec"), col("cvec2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }
}
