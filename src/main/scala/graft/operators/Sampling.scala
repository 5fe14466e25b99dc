package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling & splitting for training-data pipelines.
  *
  * Random sampling (`df.sample`) is non-reproducible across runs,
  * partitionings, and engines; a training pipeline needs the SAME
  * train/heldout membership on every rebuild and in every system that
  * touches the corpus. Hashing a stable row id gives that: a row is in
  * the sample iff a fixed-width prefix of `md5(id)` falls below a
  * rate-derived threshold — a pure per-row projection (no shuffle, no
  * state, trivially parallel at 100 TB) that any engine reproduces
  * bit-for-bit (md5 hex is engine-portable; the threshold compare is a
  * plain string compare on the first 4 hex digits = 16 uniform bits).
  *
  * Stratified rates (per-language quotas, source mixes) are a per-row
  * CASE over the stratum column — still projection-only. Disjoint
  * decisions (sample membership vs train/test split) use domain-salted
  * hashes (`id:salt`) so they are independent by construction.
  */
object Sampling {

  /** 4-hex-digit threshold for `rate` over the 16-bit md5 prefix.
    * rate = 1.0 returns "g000", which sorts after every hex digest
    * ('g' > 'f'), so the keep-all case needs no special predicate. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    val n = math.round(rate * 65536).toInt
    if (n >= 65536) "g000" else f"$n%04x"
  }

  /** The 16-bit sampling bucket of `id` under `salt`, as the first 4
    * lowercase-hex chars of md5 — lexicographic compare on hex equals
    * numeric compare on the 16-bit value. */
  def bucket(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4)

  /** Keep rows whose bucket falls under the stratum's rate; strata not
    * in `rates` use `defaultRate`. */
  def stratifiedDeterministic(
      df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "sample"): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === lit(stratum), lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(bucket(idCol, salt) < thr)
  }

  /** True iff `id` lands in the train split at `trainFraction` —
    * independent of sample membership via a different salt. */
  def isTrain(idCol: Column, trainFraction: Double): Column =
    bucket(idCol, "split") < lit(thresholdHex(trainFraction))

  /** Epoch-salted deterministic shuffle key — the training-order
    * primitive: ordering by it is a reproducible global permutation
    * of the corpus (same epoch → identical order on any cluster or
    * engine; next epoch → an independent fresh permutation, no state
    * carried). At scale `ORDER BY shuffle_key` is a range-partitioned
    * sort over a 16-byte key per row, and the epoch never rewrites
    * data — the permutation is recomputed from ids. */
  def shuffleKey(idCol: Column, epoch: Int): Column =
    md5(concat(idCol.cast("string"), lit(s":epoch:$epoch")))

  // ---- weighted sampling without replacement (A-ES) ------------------

  /** 2^60 as a double (exact: power of two). */
  private val Pow60 = 1152921504606846976.0d

  /** Efraimidis–Spirakis A-ES priority for weighted sampling WITHOUT
    * replacement: `u^(1/w)` with `u` uniform in [0,1) — taking the K
    * LARGEST priorities yields a sample where inclusion probability
    * is proportional to weight (Efraimidis & Spirakis, IPL 97(5),
    * 2006 — the standard distributed weighted-reservoir scheme).
    *
    * `u` comes from the 60-bit md5 prefix (`Hashing.h60`) of
    * `id:salt`, so the sample is DETERMINISTIC: same corpus → same
    * sample on any engine, cluster, or partitioning — the property
    * every training-mix pipeline needs and `rand()`-based sampling
    * cannot give. long→double rounding is IEEE round-to-nearest in
    * both engines and /2^60 is exact, so `u` is bit-identical
    * cross-engine; the priority is rounded to 12 decimals on both
    * sides before ranking so a last-ulp `pow` difference cannot flip
    * an order (ties broken by id — the q61/q71 convention).
    *
    * At 100 TB: a pure projection plus one global top-K
    * (TakeOrderedAndProject — per-partition heaps of K, no sort, no
    * shuffle of non-winners). */
  def weightedPriority(idCol: Column, weightCol: Column, salt: String): Column = {
    val u = graft.text.Hashing.h60(
      concat(idCol.cast("string"), lit(":" + salt))).cast("double") / lit(Pow60)
    round(pow(u, lit(1.0d) / weightCol.cast("double")), 12)
  }

  /** DuckDB rendering of [[weightedPriority]] — generated from the
    * same h60 primitive so the engines cannot drift. */
  def weightedPrioritySql(idExpr: String, weightExpr: String, salt: String): String = {
    val u = s"(${graft.text.Hashing.h60Sql(s"($idExpr)::VARCHAR || ':$salt'")}::DOUBLE" +
      s" / $Pow60)"
    s"round(pow($u, 1.0 / ($weightExpr)::DOUBLE), 12)"
  }
}
