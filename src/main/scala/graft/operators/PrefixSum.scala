package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum (global running total in a total
  * order) — WITHOUT the single-partition window Spark plans for
  * `sum(...).over(Window.orderBy(...))`, which serializes the whole
  * dataset through one task and is the canonical 100 TB cluster-killer
  * hiding inside "just add a running total".
  *
  * Classic two-phase scan:
  *   1. rows are bucketed by a caller-supplied monotone function of
  *      the (unique) order key — bucket boundaries respect the order;
  *   2. per-bucket sums aggregate (one narrow shuffle), the driver
  *      prefix-scans the bucket totals (state = one long per bucket —
  *      choose `bucketOf` so bucket count stays ~10³-10⁶), and the
  *      offsets broadcast back;
  *   3. an intra-bucket running window (partitioned by bucket — real
  *      parallelism, bounded partitions) adds the bucket offset.
  *
  * The result equals the global ordered cumsum bit-for-bit for
  * integer values (pure integer math end to end). */
object PrefixSum {

  /** Adds `cumCol` = running sum of `valueCol` (inclusive) and
    * `preCol` = exclusive prefix (cum − value) in the total order of
    * `orderCol`. `orderCol` values must be unique and non-null;
    * `bucketOf` must be monotone non-decreasing in `orderCol`. */
  def withPrefixSum(
      df: DataFrame, orderCol: String, valueCol: String,
      bucketOf: Column, cumCol: String = "cum", preCol: String = "pre"): DataFrame = {
    val b = df.withColumn("__bucket", bucketOf)
    val bucketTotals = b.groupBy("__bucket")
      .agg(sum(col(valueCol)).as("__bsum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = bucketTotals.map { case (bk, s) =>
      val o = (bk, acc); acc += s; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offs = broadcast(offsets.toSeq.toDF("__bucket", "__boff"))
    val w = Window.partitionBy("__bucket").orderBy(orderCol)
    b.join(offs, "__bucket")
      .withColumn(cumCol, col("__boff") + sum(col(valueCol)).over(w))
      .withColumn(preCol, col(cumCol) - col(valueCol))
      .drop("__bucket", "__boff")
  }
}
