package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Hashing

/** SimHash fingerprinting (Charikar 2002; Manku/Jain/Sarma WWW'07 for
  * the hamming-block candidate generation).
  *
  * 60-bit fingerprints over distinct word BIGRAMS: per document, bit b
  * is the sign of `sum over features of (bit b of feature-hash ? +1 :
  * -1)`. Bigrams (not unigrams) because profiling showed a small shared
  * vocabulary makes unigram fingerprints collapse — thousands of
  * sub-hamming-3 pairs — while bigram features separate the 25 planted
  * near-dup pairs cleanly. 60 bits = the md5-prefix hash width
  * ([[Hashing.h60]]), and keeps every partial sum of the bit-weight
  * reconstruction positive (no 2^63 sign games in either engine).
  *
  * Computed as one explode + one aggregate with 60 conditional-sum
  * exprs (codegen'd, partial-agg friendly) — no per-doc loops.
  *
  * Near-dup pairs (hamming ≤ 3) via the Manku block trick: split the
  * fingerprint into 4 15-bit chunks; any pair within hamming ≤ 3 must
  * agree exactly on ≥ 1 chunk (pigeonhole), so a self-join keyed by
  * (chunk_index, chunk_value) finds ALL such pairs while only comparing
  * colliding fingerprints — never O(n²). Exact hamming then filters.
  */
object SimHash {

  val Bits = 60
  val Chunks = 4
  val BitsPerChunk: Int = Bits / Chunks

  /** (id, simhash) — 60-bit fingerprint as a long. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // repartition: one tiny input split otherwise serializes the
    // bigram-explode + 60 hash-bit sums onto a single core
    val feats = graft.Partitioning.spread(docs, col(idCol)).select(col(idCol).as("id"),
      explode(Hashing.wordShingles(col(textCol), 2)).as("feat"))
    // hash ONCE in a projection: aggregate expressions get no common-
    // subexpression elimination, so referencing h60(feat) inside all 60
    // conditional sums would run 60 md5s per row (measured 3x query cost)
    val hashed = feats.select(col("id"), Hashing.h60(col("feat")).as("h"))
    val h = col("h")
    val bitSums = (0 until Bits).map { b =>
      sum(when(shiftright(h, b) % 2 === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val agg = hashed.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until Bits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("id"), fp.as("simhash"))
  }

  /** [[fingerprints]] → [[nearDuplicates]] with the fingerprint table
    * persisted (both sides of the chunk self-join read it — uncached,
    * the explode + 60 bit-sum aggregation runs twice) and released via
    * [[graft.CachedResult]]. */
  def nearDuplicatesResult(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): graft.CachedResult = {
    // eager (graft.Scratch.eager): both chunk self-join sides read the
    // fingerprints; lazy, AQE's concurrent stage jobs raced recomputes
    // of the explode + 60-bit-sum aggregate into the unfilled cache
    val fp = graft.Scratch.eager(fingerprints(docs, idCol, textCol))
    graft.CachedResult(nearDuplicates(fp, maxHamming), Seq(fp))
  }

  /** All pairs (a < b) with hamming(simhash_a, simhash_b) ≤ maxHamming
    * (maxHamming < Chunks for the pigeonhole guarantee). */
  def nearDuplicates(fp: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Chunks, s"pigeonhole needs maxHamming < $Chunks")
    val chunkStructs = (0 until Chunks).map { c =>
      struct(lit(c).as("chunk"),
        (shiftright(col("simhash"), c * BitsPerChunk) % (1L << BitsPerChunk)).as("cv"))
    }
    val chunks = fp.select(col("id"), col("simhash"),
        explode(array(chunkStructs: _*)).as("ck"))
      .select(col("id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.cv").as("cv"))
    val l = chunks.toDF("doc_a", "sim_a", "chunk", "cv")
    val r = chunks.toDF("doc_b", "sim_b", "chunk", "cv")
    // hamming filter BEFORE distinct: a skewed bucket (many docs with
    // identical chunks) would otherwise materialize a quadratic
    // distinct set; bit_count is a codegen'd per-row op, so filtering
    // first keeps only true near-dups.
    l.join(r, Seq("chunk", "cv")).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .distinct()
  }
}
