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

/** Scratch-table persistence helpers shared by the multi-pass
  * operators. */
object Scratch {
  /** Persist + EAGERLY materialize a scratch table (one count job).
    *
    * Lazy persists are populated by whichever downstream job touches
    * them first — and under AQE the downstream exchanges materialize
    * as CONCURRENT stage jobs, so several race into the unfilled cache
    * at once: per-partition block locks serialize the winners and the
    * losers recompute the whole subtree (round-12 measurement: q184's
    * delta shingle+signature subtree ran 6-8× per action; stages with
    * run ≫ cpu are the tell — tasks parked on cache locks). One
    * count() converts that into a single clean build every consumer
    * then serves from. Only worth it for scratch that is (a) expensive
    * to compute and (b) read by 2+ downstream exchanges; the extra job
    * is ∝ the scratch table itself. */
  def eager(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }
}
