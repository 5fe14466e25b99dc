package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Bloom-filter join pruning — shrink the BIG side of a
  * non-broadcastable join BEFORE its shuffle.
  *
  * The regime: fact ⋈ dim where the dim is too large (or policy-barred)
  * to broadcast, so the join is sort-merge and the fact pays a full
  * shuffle — but only a fraction of fact rows have a join partner
  * (a filtered dim, a rare-key semi-join). A Bloom filter of the dim's
  * join keys costs ~1.2 bytes/key at 1% false positives (a 10⁷-key dim
  * ≈ 12 MB — broadcastable when the dim's ROWS are not), and the fact
  * probes it in a pure codegen projection at the scan: rows without a
  * partner never enter the exchange. No false negatives, so the join
  * result is EXACTLY the plain join's — false positives just ride to
  * the join and drop there. This is Spark's own runtime-filter
  * optimization made explicit, deterministic, and available across
  * stages (the built-in one only fires within a query, under size
  * heuristics this operator doesn't gamble on).
  *
  * At 100 TB: shuffle volume is the bottleneck of every fact-fact
  * join; pruning at the scan cuts it by the join selectivity (5× for
  * a 20%-selective dim) for the price of one broadcast and one
  * codegen probe per row. The filter is reusable — build once, prune
  * every downstream join/scan in the pipeline against the same keys.
  */
object BloomPrune {

  /** Serialized Bloom filter of `keys` (integral column, probed as
    * long). `fpp` trades filter size for pruning waste: false
    * positives survive pruning only to die in the join.
    *
    * Sizing: `expectedNumItems` should come from the caller (a catalog
    * row count, the known dim cardinality) — oversizing only costs
    * filter bytes, undersizing only raises the effective fpp; neither
    * affects correctness. When absent, the optimizer's row-count
    * estimate is used if it exists, and only as a last resort does the
    * build pay an extra `count()` pass over the dim (the one pass the
    * aggregate itself already pays — doubling dim scans purely for
    * sizing is what the estimate path avoids). */
  def buildFilter(
      dim: DataFrame, keyCol: String, fpp: Double = 0.01,
      expectedNumItems: Option[Long] = None): Array[Byte] = {
    val n = expectedNumItems
      .orElse(dim.queryExecution.optimizedPlan.stats.rowCount.map(_.longValue))
      .getOrElse(dim.count())
    val bf = dim.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact` rows whose `keyCol` might be in `bits` — the codegen
    * membership probe, no UDF node, stays in whole-stage codegen. */
  def pruned(fact: DataFrame, keyCol: String, bits: Array[Byte]): DataFrame =
    fact.filter(graft.functions.BloomOps.mightContainLong(col(keyCol), bits))

  /** The composed shape: build the filter on the dim, prune the fact
    * at its scan, then run the exact join — result is precisely
    * `fact.join(dim, condition)`, with the fact's shuffle carrying
    * only rows that might match. */
  def prunedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    val bits = buildFilter(dim, dimKey, fpp)
    pruned(fact, factKey, bits)
      .join(dim, col(factKey) === col(dimKey))
  }
}
