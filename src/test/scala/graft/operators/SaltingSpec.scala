package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two salting claims q208's oracle cannot separate: result
  * identity with the plain join (the oracle sees only this) and the
  * PLACEMENT property — the hot key's rows actually spread — which is
  * invisible in any result. */
class SaltingSpec extends SparkSpec {

  private def skewedFact = {
    import graft.queries.ExtendedQueries.{SkewHotMax, SkewHotMod}
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_custkey") % SkewHotMod < SkewHotMax, lit(1L))
          .otherwise(col("o_custkey")).as("cust"))
  }

  private def dim =
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("cust"), col("c_mktsegment"))

  test("salted join equals the plain join row-for-row") {
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("o_orderkey", "cust", "c_mktsegment")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val plain = key(skewedFact.join(dim, "cust"))
    val salted = key(Salting.saltedJoin(
      skewedFact, dim, "cust", col("o_orderkey"), 16))
    assert(salted.nonEmpty && salted == plain)
  }

  test("salting spreads the hot key: max shuffle-partition share drops below 2x mean") {
    def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
      val counts = df.groupBy(spark_partition_id().as("p"))
        .count().collect().map(_.getLong(1))
      counts.max.toDouble / counts.sum
    }
    val parts = 8
    val unsalted = maxShare(skewedFact.repartition(parts, col("cust")))
    val salted = maxShare(skewedFact
      .withColumn("__salt", Salting.salt(col("o_orderkey"), 16))
      .repartition(parts, col("cust"), col("__salt")))
    // ~70% of rows share one key → unsalted piles them on one partition
    assert(unsalted >= 0.5, s"skew construction broken: max share $unsalted")
    assert(salted <= 2.0 / parts,
      s"salting failed to spread the hot key: max share $salted")
  }

  test("dim uniqueness contract: replication never duplicates matches") {
    val plainCount = skewedFact.join(dim, "cust").count()
    val saltedCount =
      Salting.saltedJoin(skewedFact, dim, "cust", col("o_orderkey"), 16).count()
    assert(saltedCount == plainCount)
  }
}
