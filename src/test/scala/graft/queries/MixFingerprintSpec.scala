package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixFingerprintSpec extends SparkSpec {

  test("q106: temperature sampling hits the budget and flattens the mix") {
    val rows = ScaleQueries.temperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = rows.map(_._2).sum
    val kept = rows.map(_._5).sum
    // total kept tracks Budget*N (md5 buckets are ~uniform; 16-bit
    // quantization + sampling noise stay well under 10%)
    val budget = n.toDouble / ScaleQueries.TempBudgetDen
    assert(math.abs(kept - budget) < 0.1 * n, s"kept $kept of $n (budget $budget)")
    // alpha < 1 flattens: thr ∝ isqrt(n)/n, so clearly-bigger languages
    // get lower thresholds (isqrt granularity can flip near-equal
    // counts — e.g. n=80/w=8 vs n=82/w=9 — so compare the extremes)
    val bySize = rows.sortBy(_._2)
    assert(bySize.last._2 > bySize.head._2, "fixture mix degenerate")
    assert(bySize.last._4 < bySize.head._4,
      s"largest lang must sample at a lower rate: ${bySize.head} vs ${bySize.last}")
    // sampled fraction per lang tracks thr/65536 (the rate actually applied)
    rows.foreach { case (lang, nl, _, thr, keptL) =>
      val exp = nl.toDouble * math.min(thr, 65536L) / 65536.0
      assert(math.abs(keptL - exp) <= 4 * math.sqrt(exp + 1) + 3,
        s"$lang: kept $keptL vs expected $exp")
    }
  }

  test("q107: fingerprints are order/partitioning-independent and content-sensitive") {
    val base = ExtendedQueries.datasetFingerprints(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(base.keySet == Set("documents", "lineitem", "orders"))

    // invariance: recompute over a reshuffled copy of orders
    val o = QueryUtil.table(spark, sfDir, "orders")
    val render = concat_ws("|", col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_orderpriority"),
      floor(col("o_totalprice") * 100).cast("long"))
    def fpOf(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.select(render.as("r"))
        .select(expr("cast(conv(substring(md5(r), 1, 15), 16, 10) as bigint)").as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)"), sum(col("h") % 1000000007L)).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(fpOf(o.repartition(7).sortWithinPartitions(desc("o_totalprice")))
      == base("orders"))
    // sensitivity: one perturbed row flips the fingerprint
    val perturbed = o.withColumn("o_custkey",
      when(col("o_orderkey") === o.select(min("o_orderkey")).head.getLong(0),
        col("o_custkey") + 1).otherwise(col("o_custkey")))
    val p = fpOf(perturbed)
    assert(p._1 == base("orders")._1 && p._2 != base("orders")._2)
  }
}
