package graft.sources

import org.apache.spark.sql.DataFrame

/** Hive-style partitioned layout — the scan-side half of scale-out
  * pruning, complementing [[BucketedTables]] (which kills join
  * shuffles; partitioning kills the scan itself).
  *
  * Writing a fact table partitioned by its dominant filter column
  * (almost always the event date) turns every date-ranged query from a
  * full-corpus scan into a listing of the matching directories: the
  * pruning happens at PLAN time from the directory names, before a
  * single row is read. At 100 TB with daily partitions, a 3-day window
  * reads 0.1% of the data — the difference between a dashboard query
  * and a cluster-wide job. Partition pruning composes with column
  * pruning and predicate pushdown (PlanSpec asserts all three).
  *
  * Keep partition cardinality in the thousands, not millions: each
  * partition is a directory, and listing dominates planning beyond
  * ~10^4 partitions (date, not timestamp; country, not user).
  */
object PartitionedTables {

  /** Write `df` partitioned by `partCol` (one directory per value). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
