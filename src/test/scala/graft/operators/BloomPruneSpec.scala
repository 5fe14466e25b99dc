package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (q73's operator): exactness vs the plain
  * join, the no-false-negatives guarantee, and the claim that makes it
  * worth running — the filter actually prunes. */
class BloomPruneSpec extends SparkSpec {

  private def fact = spark.read.parquet(s"$sfDir/events.parquet")
  private def dim = spark.read.parquet(s"$sfDir/customer.parquet")
    .filter(col("c_mktsegment") === "BUILDING")
    .select(col("c_custkey"), col("c_nationkey"))

  test("pruned join equals the plain join exactly") {
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("c_nationkey").count().orderBy("c_nationkey")
        .select(col("c_nationkey").cast("long"), col("count"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = rollup(BloomPrune.prunedJoin(fact, dim, "user_id", "c_custkey"))
    val want = rollup(fact.join(dim, col("user_id") === col("c_custkey")))
    assert(want.nonEmpty && got == want)
  }

  test("no false negatives: every matching fact row survives pruning") {
    val bits = BloomPrune.buildFilter(dim, "c_custkey")
    val prunedKeys = BloomPrune.pruned(fact, "user_id", bits)
      .select(col("user_id").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val matchKeys = fact.join(dim, col("user_id") === col("c_custkey"))
      .select(col("user_id").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(matchKeys.nonEmpty && matchKeys.subsetOf(prunedKeys))
  }

  test("the filter prunes: survivors ~= selectivity, false positives near fpp") {
    val bits = BloomPrune.buildFilter(dim, "c_custkey", fpp = 0.01)
    val total = fact.count()
    val survivors = BloomPrune.pruned(fact, "user_id", bits).count()
    val matching = fact.join(dim, col("user_id") === col("c_custkey")).count()
    // BUILDING is one of 5 segments → ~20% of events match; the filter
    // must not pass much more than the true matches + fpp of the rest
    assert(survivors >= matching, "a false negative dropped a match")
    val falsePos = survivors - matching
    val nonMatching = total - matching
    assert(falsePos.toDouble <= nonMatching * 0.01 * 5 + 10,
      s"false-positive rate off: $falsePos of $nonMatching non-matching rows")
    assert(survivors.toDouble <= total * 0.5,
      s"filter barely pruned: $survivors of $total")
  }

  test("serialized-bytes equality gives the expression stable semantics") {
    val bits = BloomPrune.buildFilter(dim, "c_custkey")
    val one = org.apache.spark.sql.graft.SqlShims.expression(lit(1L))
    val a = graft.functions.BloomMightContainLong(one, bits.toIndexedSeq)
    val b = graft.functions.BloomMightContainLong(one, bits.toIndexedSeq)
    assert(a == b, "same filter bytes must compare equal (plan canonicalization)")
  }
}
