package graft

import org.apache.spark.sql.DataFrame

/** A lazily-evaluated result DataFrame plus the persisted intermediates
  * its plan reads.
  *
  * Multi-pass operators (MinHash/n-gram dedup, SimHash) persist scratch
  * tables (postings, prefixes, fingerprints) that the returned plan
  * references — they cannot be unpersisted before the caller's final
  * action without recomputing them. Library callers that issue many
  * such calls in one application should `release()` each result after
  * its final action, or the MEMORY_AND_DISK scratch accumulates until
  * eviction. `spark.catalog.clearCache()` is the blunt alternative
  * (what [[graft.Bench]] does between queries).
  */
final case class CachedResult(df: DataFrame, cached: Seq[DataFrame]) {
  /** Unpersist every intermediate (non-blocking). Safe to call more
    * than once; `df` remains valid but recomputes from scratch. */
  def release(): Unit = cached.foreach(_.unpersist(blocking = false))
}
