package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table writes — the storage-side half of shuffle-free joins.
  *
  * A join between two tables bucketed by the same key into the same
  * bucket count needs NO exchange on either side: each task reads
  * matching buckets and merge-joins them (`sortBy` makes even the sort
  * free). At 100 TB this converts the nightly fact-to-fact join from
  * two full-table shuffles into a co-located scan — the single biggest
  * shuffle eliminator Spark offers, priced once at write time.
  *
  * Bucket metadata only exists through the catalog, so this writes a
  * TABLE (`saveAsTable` with an explicit external path), not a bare
  * parquet directory. Size `buckets` so one bucket of the bigger table
  * fits an executor's memory (128-512 MB of parquet per bucket is the
  * usual target).
  */
object BucketedTables {

  /** Write `df` as an external bucketed+sorted parquet table.
    *
    * The pre-write `repartition(buckets, key)` uses the same murmur3
    * hash as the bucket layout, so every task holds exactly one bucket
    * and each bucket lands in ONE file — the condition under which the
    * scan trusts `sortBy` order and a downstream merge join needs
    * neither Exchange nor Sort. Without it, every write task emits a
    * file per bucket (task-count × buckets small files at scale) and
    * readers must re-sort. */
  def writeBucketed(
      df: DataFrame, tableName: String, path: String,
      key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(tableName)
}
