package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** Product quantization (Jégou et al., PAMI 2011) for cosine ANN at
  * memory scale: each L2-normalized vector is split into M subspaces
  * and every subspace is quantized to one of K codewords, so a d-dim
  * float vector compresses to M small integers (d=64 → 8 bytes,
  * 32× smaller than the float payload). Search computes asymmetric
  * distances (ADC): per query, an M×K lookup table of
  * query-subvector · codeword dots, so scoring a vector is M table
  * reads instead of d multiplies — the candidate scan is bandwidth-
  * bound on codes, not on raw vectors.
  *
  * Scale shape (100 TB): codebooks train on a sample and are tiny
  * (M·K·(d/M) doubles — KBs); encoding is one codegen projection over
  * the corpus scan ([[graft.functions.PqOps.pq_encode]], no UDF, no
  * shuffle); the ADC scan broadcasts per-query LUTs and reads ONLY the
  * code column (column pruning drops the raw vectors); exact re-rank
  * touches raw vectors for just the topC candidate ids. Composes with
  * [[IvfIndex]] cells for IVF-PQ (prune cells first, ADC within cells).
  *
  * Exactness: ADC is lossy by construction, so the gated query re-ranks
  * the topC ADC candidates by EXACT cosine — on the shipped corpora the
  * candidate set provably contains the true top-k (asserted in the
  * spec), making the final output identical to brute force and
  * DuckDB-hashable. The approximate regime (smaller topC) stays
  * spec-covered via recall.
  */
object ProductQuantizer {

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Train per-subspace codebooks with `iters` Lloyd iterations on the
    * L2-normalized corpus. Deterministic: seeds are the K vectors
    * smallest by `xxhash64(id)` (the [[IvfIndex.train]] spread-init —
    * id-adjacent vectors are correlated on this corpus), codeword j of
    * every subspace seeded from the same j-th vector; updates are
    * plain subvector means (L2 geometry — NOT the normalize-mean of
    * the cosine coarse quantizer). One job per iteration aggregates
    * all M subspaces at once: the shuffle carries ≤ M·K partial sums
    * per task. Empty cells keep their codeword. Returns
    * `[m][k][d/M]`. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ds = corpus
      .select(col(idCol).cast("long").as("id"),
        CosineKnn.toDoubleArray(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, normalize(v)) }
    val seeds = ds.orderBy(xxhash64(col("_1")), col("_1")).limit(k).collect()
    require(seeds.length == k, s"corpus smaller than k=$k")
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    var cb: Array[Array[Array[Double]]] = Array.tabulate(m, k) { (s, j) =>
      seeds(j)._2.slice(s * sub, (s + 1) * sub)
    }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cb)
      val sums = ds.mapPartitions { it =>
        val books = bc.value
        it.flatMap { case (_, v) =>
          (0 until books.length).iterator.map { s =>
            val base = s * sub
            val words = books(s)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < words.length) {
              val w = words(c)
              var d = 0.0; var i = 0
              while (i < sub) {
                val diff = v(base + i) - w(i); d += diff * diff; i += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            ((s, best), (v.slice(base, base + sub), 1L))
          }
        }
      }.rdd.reduceByKey { (p1, p2) =>
        val s = new Array[Double](sub)
        var i = 0
        while (i < sub) { s(i) = p1._1(i) + p2._1(i); i += 1 }
        (s, p1._2 + p2._2)
      }.collect()
      val next = cb.map(_.map(_.clone()))
      sums.foreach { case ((s, c), (sum, n)) =>
        next(s)(c) = sum.map(_ / n.toDouble)
      }
      cb = next
      bc.destroy()
    }
    cb
  }

  /** `(id, code)` — one codegen projection over the scan. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: Array[Array[Array[Double]]]): DataFrame =
    corpus.select(col(idCol).cast("long").as("id"),
      graft.functions.PqOps.pq_encode(
        CosineKnn.toDoubleArray(col(vecCol)), cb).as("code"))

  /** ADC-ranked candidates per query: `(query_id, id, rk)` where `rk`
    * is the 1-based ADC rank. Scans ONLY the code column against each
    * query's broadcast M×K lookup table. */
  def adcCandidates(corpus: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, cb: Array[Array[Array[Double]]],
      topC: Int): DataFrame =
    adcFromCodes(encode(corpus, idCol, vecCol, cb),
      corpus, idCol, vecCol, nQueries, cb, topC)

  /** [[adcCandidates]] over a PRECOMPUTED `(id, code)` relation — the
    * stored-codes serving path (q202): the raw corpus is touched only
    * to collect the query vectors for the LUTs; no [[encode]]
    * projection (and so no `pq_encode` expression) appears in the
    * query plan. */
  def adcFromCodes(codes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, nQueries: Int, cb: Array[Array[Array[Double]]],
      topC: Int): DataFrame = {
    val spark = corpus.sparkSession
    val m = cb.length
    val sub = cb(0)(0).length

    val qRows = corpus.filter(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("query_id"),
        CosineKnn.toDoubleArray(col(vecCol)).as("qv"))
      .collect()
    val lutRows: Seq[Row] = qRows.toSeq.map { r =>
      val qn = normalize(r.getSeq[Double](1).toArray)
      val lut: Seq[Seq[Double]] = (0 until m).map { s =>
        val base = s * sub
        cb(s).toSeq.map { w =>
          var dot = 0.0; var i = 0
          while (i < sub) { dot += qn(base + i) * w(i); i += 1 }
          dot
        }
      }
      Row(r.getLong(0), lut)
    }
    val luts = spark.createDataFrame(
      spark.sparkContext.parallelize(lutRows, 1),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("lut", ArrayType(ArrayType(DoubleType, false), false),
          nullable = false))))

    val adc = expr(s"aggregate(sequence(1, $m), cast(0.0 as double)," +
      " (acc, i) -> acc + element_at(element_at(lut, i)," +
      " element_at(code, i) + 1))")
    codes
      .join(broadcast(luts), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), adc.as("adc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("adc"), asc("id"))))
      .filter(col("rk") <= topC)
      .select("query_id", "id", "rk")
  }

  /** Exact-on-top-of-ADC top-k: keep the topC ADC candidates per
    * query, then re-rank ONLY those by exact cosine against the raw
    * vectors. Output `(query_id, rank, neighbor_id, cos)` — identical
    * to brute force whenever the candidate set covers the true top-k
    * (the gated regime). */
  def searchTopK(corpus: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, cb: Array[Array[Array[Double]]],
      topC: Int, topK: Int): DataFrame =
    searchTopKFromCodes(encode(corpus, idCol, vecCol, cb),
      corpus, idCol, vecCol, nQueries, cb, topC, topK)

  /** [[searchTopK]] with the ADC scan running over a PRECOMPUTED
    * `(id, code)` relation (the persisted-codes store): identical
    * output whenever the codes equal [[encode]] of the corpus — raw
    * vectors are read only for the query LUTs and the topC exact
    * re-rank. */
  def searchTopKFromCodes(codes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, nQueries: Int,
      cb: Array[Array[Array[Double]]],
      topC: Int, topK: Int): DataFrame = {
    val cands = adcFromCodes(codes, corpus, idCol, vecCol, nQueries, cb, topC)
      .select("query_id", "id")

    val vecs = corpus.select(col(idCol).cast("long").as("id"),
      CosineKnn.toDoubleArray(col(vecCol)).as("nv"))
    val qVecs = corpus.filter(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("query_id"),
        CosineKnn.toDoubleArray(col(vecCol)).as("qvec"))
    cands.join(vecs, "id").join(broadcast(qVecs), "query_id")
      .select(col("query_id"), col("id").as("neighbor_id"),
        CosineKnn.cosine(col("qvec"), col("nv")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("c"), asc("neighbor_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cos"))
  }
}
