package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gates for the round-3 scale queries that are approximate or
  * streaming (their driver gate is rows-only or the batch oracle):
  * q48's sketch-cube error bound and q49's stream==batch equality. */
class ScaleQueriesSpec extends SparkSpec {

  test("q48: union-merged daily HLL sketches estimate within 5% of exact") {
    val got = ScaleQueries.hllCube(spark, sfDir).head()
    val est = got.getAs[Long]("nd_users_est").toDouble
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(exact > 0 && math.abs(est - exact) / exact < 0.05,
      s"est=$est exact=$exact")
    // the cube really covered the whole table
    assert(got.getAs[Long]("n_events") == ev.count())
  }

  test("q49: stream-static enrichment equals the batch join") {
    val got = ScaleQueries.streamEnrich(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
    val want = ev.join(cust, col("user_id") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_events"),
        QueryUtil.moneySum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == want)
  }
}
