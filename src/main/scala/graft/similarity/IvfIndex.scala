package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * init = the nlist smallest-id vectors. Returns the centroid table. */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus
      .select(col(idCol).cast("long").as("id"),
        CosineKnn.toDoubleArray(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
    var centroids = ds.orderBy("id").limit(nlist).collect().map(t => normalize(t._2))
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

  /** Corpus with an assigned `cell` column. */
  def assign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    val centDf = broadcast(centroidsDf(spark, centroids))
    val v = CosineKnn.toDoubleArray(col(vecCol))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("csim"), asc("cell"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(centDf)
      .withColumn("csim", CosineKnn.cosine(v, col("cvec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("cell"))
  }

  def centroidsDf(spark: SparkSession, centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("cell", "cvec")
  }

  /** Approximate top-k: probe the nprobe nearest cells per query.
    * Output schema matches [[CosineKnn.topK]]. */
  def search(
      assigned: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, centroids: Array[Array[Double]],
      k: Int, nprobe: Int): DataFrame = {
    val spark = assigned.sparkSession
    val centDf = broadcast(centroidsDf(spark, centroids))
    val qv = CosineKnn.toDoubleArray(col(vecCol))
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cell"))
    val probes = queries
      .select(col(idCol).as("query_id"), qv.as("qvec"))
      .crossJoin(centDf)
      .withColumn("csim", CosineKnn.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
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
