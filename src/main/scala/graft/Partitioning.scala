package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Compute-spreading repartition.
  *
  * Small-on-disk tables (documents, embeddings) arrive as ONE input
  * split, and AQE plans shuffle partitioning by *bytes*, so pipelines
  * whose cost is per-row CPU (hashing, shingling, array intersection)
  * end up single-threaded. `repartition(col)` alone does not fix it:
  * without an explicit partition count AQE may coalesce the exchange
  * right back. Pinning numPartitions = defaultParallelism makes the
  * exchange non-negotiable.
  *
  * On a real cluster the same holds: CPU-bound stages over compact
  * columnar input need hash-spread exchanges sized to cores, not bytes.
  */
object Partitioning {
  def spread(df: DataFrame, by: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, by)
}
