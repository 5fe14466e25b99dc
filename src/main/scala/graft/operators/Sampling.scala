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
}
