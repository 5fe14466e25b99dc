package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash.
  *
  * The scalable shape for 100 TB: hash each document to a fixed-width
  * key (md5 — 16 bytes instead of shuffling full text), one hash-
  * partitioned aggregation keyed by the digest, keep the smallest id per
  * group. The shuffle carries (digest, id) pairs only — ~24 bytes/row
  * regardless of document size — and partial aggregation collapses
  * in-partition duplicates before the exchange.
  *
  * No reference analogue (`distinct rows` is a declared TODO,
  * reference: jar/ProfileJob.java:67); this is the LLM-pipeline
  * extension surface.
  */
object ExactDedup {

  /** Per-duplicate-group summary: (keep_id, group_size). Groups of size 1
    * are unique documents; keep_id is the canonical survivor (min id). */
  def groups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(min("id").as("keep_id"), count(lit(1)).as("group_size"))

  /** Corpus-level dedup stats in one pass. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    groups(docs, idCol, textCol).agg(
      count(lit(1)).as("n_distinct"),
      sum("group_size").as("n_docs"),
      (sum("group_size") - count(lit(1))).as("n_duplicates"),
      sum(when(col("group_size") > 1, 1L).otherwise(0L)).as("n_dup_groups"))

  /** The deduplicated view: one row per distinct content, smallest id wins. */
  def dedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = groups(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, idCol) // broadcast-able when the dup rate is high
  }
}
