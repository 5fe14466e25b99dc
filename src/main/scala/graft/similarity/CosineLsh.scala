package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine similarity (Charikar, STOC'02) —
  * the third blocking family next to MinHash-LSH (Jaccard) and IVF
  * (cosine, centroid-based): `P(sign bit equal) = 1 − θ/π`, so banding
  * sign sketches buckets high-cosine pairs with tunable recall and no
  * training step (vs IVF's Lloyd iterations — LSH is the right tool
  * when the corpus has no stable cluster structure to train on, or
  * when the index must be purely append-only/stateless at 100 TB:
  * a vector's bucket keys depend only on the vector itself).
  *
  * Regime note (same economics as q40's IVF): banded sign sketches
  * prune hard at HIGH thresholds (τ ≥ 0.8: 8×6-bit bands keep ~12% of
  * random pairs while missing <10% of τ-pairs); at mid thresholds
  * (τ≈0.4, q24's corpus) θ/π ≈ 0.37 makes band collisions nearly
  * uninformative — use IVF probing there. Candidates are always
  * verified with the exact native cosine, so precision is exact by
  * construction; recall is the tunable.
  *
  * Cross-engine determinism: plane components derive from
  * [[graft.text.Hashing.x31Jvm]] over "hp:p:d" strings — the DuckDB
  * oracle regenerates the identical matrix from the same formula, so
  * sketches, bands, candidates, and verified pairs all match
  * hash-exactly.
  */
object CosineLsh {

  val Bands = 8
  val BandBits = 6
  val NumPlanes: Int = Bands * BandBits // 48

  /** Deterministic plane component in [-1, 1], identical in Scala and
    * in the generated SQL ([[planeComponentSql]]). */
  def planeComponent(p: Int, d: Int): Double =
    ((graft.text.Hashing.x31Jvm(s"hp:$p:$d") % 2001) - 1000) / 1000.0

  /** SQL twin over integer columns/exprs `p` and `d`. */
  def planeComponentSql(p: String, d: String): String = {
    val x = graft.text.Hashing.x31Sql(s"'hp:' || ($p)::VARCHAR || ':' || ($d)::VARCHAR")
    s"((($x % 2001) - 1000) / 1000.0)"
  }

  def planes(dim: Int): Array[Array[Double]] =
    Array.tabulate(NumPlanes, dim)(planeComponent)

  /** Unordered candidate pairs (doc_a < doc_b) whose sign sketches
    * collide in at least one band. One narrow codegen projection per
    * row for the 48-bit sketch, ×[[Bands]] explode for the band keys,
    * then a self-equi-join on (band, key) — shuffle keys only, never
    * vectors. */
  def candidatePairs(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    val mask = (1L << BandBits) - 1
    val sk = graft.Partitioning.spread(corpus, col(idCol))
      .select(col(idCol).as("id"),
        graft.functions.VectorOps.hyperplane_sign_bits(
          CosineKnn.toDoubleArray(col(vecCol)), planes(dim)).as("bits"))
    val keys = array((0 until Bands).map(b =>
      shiftright(col("bits"), b * BandBits).bitwiseAND(lit(mask)).cast("int")): _*)
    val banded = sk.select(col("id"), posexplode(keys).as(Seq("band", "key")))
    val la = banded.toDF("doc_a", "band", "key")
    val lb = banded.toDF("doc_b", "band", "key")
    la.join(lb, Seq("band", "key")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Candidates → exact-cosine verify ≥ threshold. The banded sketch
    * plan is referenced twice (both join sides), so it is persisted
    * and returned as the release handle ([[graft.CachedResult]]). */
  def nearDuplicatesResult(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double): graft.CachedResult = {
    // eager (graft.Scratch.eager): the sketch/verify sides all read the
    // prepared vectors; lazy, AQE's concurrent stage jobs raced
    // recomputes into the unfilled cache
    val prepared = graft.Scratch.eager(corpus
      .select(col(idCol), CosineKnn.toDoubleArray(col(vecCol)).as(vecCol)))
    val cand = candidatePairs(prepared, idCol, vecCol, dim)
    val out = CosineKnn.verifyPairs(cand, prepared, idCol, vecCol, threshold)
    graft.CachedResult(out, Seq(prepared))
  }
}
