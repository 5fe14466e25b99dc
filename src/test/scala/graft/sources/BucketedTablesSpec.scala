package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located join: the write-once / never-shuffle-again
  * pattern, plan-asserted. */
class BucketedTablesSpec extends SparkSpec {

  test("same-bucketed tables join with zero exchanges and correct rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      BucketedTables.writeBucketed(li, "li_bucketed", s"$dir/li", "l_orderkey", 4)
      BucketedTables.writeBucketed(ord, "ord_bucketed", s"$dir/ord", "l_orderkey", 4)
      // model the 100 TB case: both sides too big to broadcast — that
      // is when bucketing earns its keep (broadcast-able sides never
      // needed the shuffle in the first place)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located merge join:\n$plan")
      // correctness: same rows as the plain parquet join
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected)
      // bucket pruning bonus: a point filter on the bucket key scans
      // only the matching bucket. autoBucketedScan drops the bucketed
      // layout for scans that don't need its distribution, so force it
      // for this sub-check (a real point-lookup workload would set it).
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val key = li.select("l_orderkey").head().getLong(0)
      val pruned = spark.table("li_bucketed")
        .filter(col("l_orderkey") === key)
        .queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      assert(pruned.contains("SelectedBucketsCount: 1 out of 4"),
        s"bucket pruning missing:\n$pruned")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
