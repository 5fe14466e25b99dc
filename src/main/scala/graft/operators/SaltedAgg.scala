package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — the skew-mitigation pattern for
  * aggregates whose reduce state does not shrink map-side.
  *
  * Plain `groupBy(key).agg(countDistinct(v))` on a low-cardinality /
  * skewed key funnels each key's ENTIRE distinct set through one
  * reducer in the final phase (Spark expands distinct to
  * groupBy(key, v) then groupBy(key) count — the second shuffle sends
  * nd(v) rows per key to a single task). For a hot key with billions
  * of distinct values that task is the job.
  *
  * Salting by a hash of the VALUE splits each key's value set into
  * `nSalts` disjoint shards: phase 1 computes an exact distinct count
  * per (key, shard) on `nSalts` independent reducers, phase 2 sums the
  * shard counts — exact, because value-hash sharding partitions the
  * distinct set (the same value always lands in the same shard).
  * The final shuffle carries `nSalts` longs per key instead of nd(v)
  * rows. AQE's skew handling cannot do this (it splits map partitions,
  * not reduce-side per-key state); salting is the design-time answer.
  */
object SaltedAgg {

  /** Exact per-key distinct count of `valueCol`, skew-proofed across
    * `nSalts` value-hash shards. Nulls are ignored (SQL semantics). */
  def distinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      nSalts: Int, outName: String): DataFrame = {
    require(nSalts > 0)
    val salt = pmod(xxhash64(col(valueCol)), lit(nSalts.toLong)).as("__salt")
    df.groupBy(keyCols.map(col) :+ salt: _*)
      .agg(countDistinct(col(valueCol)).as("__partial_nd"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial_nd")).cast("long").as(outName))
  }

  /** Salted inner equi-join for a skewed probe side against a
    * replicable build side — the join-side twin of [[distinctCount]].
    *
    * When the probe (fact) side is heavily skewed on the join key and
    * the build side is too large to broadcast, a plain shuffle join
    * sends every row of a hot key to ONE reducer. Salting spreads
    * them: each probe row gets a deterministic salt from a hash of a
    * second, high-cardinality column (NOT `rand()` — reruns and
    * retried tasks must route identically), and the build side is
    * replicated once per salt, so the join key becomes (key, salt) and
    * a hot key's rows fan out over `nSalts` reducers. Cost: build side
    * shuffles `nSalts`× its size — pick `nSalts` ~ the skew factor,
    * not more. AQE's skew-join split solves the same problem for
    * after-the-fact skew; explicit salting is the design-time answer
    * when the skew is known and extreme (it also composes with
    * bucketing, which AQE's splits do not).
    *
    * Column names must be disjoint across the two sides. */
  def skewJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, saltFrom: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(nSalts.toLong)))
    val replicated = build.withColumn("__bsalt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        col(probeKey) === col(buildKey) && col("__salt") === col("__bsalt"))
      .drop("__salt", "__bsalt")
  }
}
