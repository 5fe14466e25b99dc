package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation (table diff / CDC backfill audit):
  * classify every key of two snapshots of the same table as
  * `added` / `removed` / `changed` / `unchanged`.
  *
  * Scale design: the snapshots are projected to `(key, digest)` BEFORE
  * the full-outer join, so the shuffle moves two narrow columns per
  * side — never the row payload. At 100 TB the diff costs two scans
  * plus one co-partitioned join of ~16 bytes/row; drill-down into
  * which rows changed then SEMI-joins the (small) changed-key set back
  * against the snapshots, touching only the delta.
  *
  * The digest must be an engine-deterministic function of the row
  * (integer/string renderings only — never raw double/timestamp
  * casts-to-string, whose text form is engine-specific); callers build
  * it with [[rowDigest]] over pre-quantized columns.
  */
object SnapshotDiff {

  /** md5 over '|'-joined column renderings; nulls render as the empty
    * string (concat_ws skips them — pair with an explicit null marker
    * column if null vs '' must be distinguished). */
  def rowDigest(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols: _*))

  /** Per-key diff: `(key, status)` with status in
    * added / removed / changed / unchanged. */
  def diff(
      base: DataFrame, current: DataFrame,
      keyCol: String, digest: Column): DataFrame = {
    val b = base.select(col(keyCol).as("key"), digest.as("base_digest"))
    val c = current.select(col(keyCol).as("key"), digest.as("cur_digest"))
    b.join(c, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("base_digest").isNull, "added")
          .when(col("cur_digest").isNull, "removed")
          .when(col("base_digest") =!= col("cur_digest"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Diff summary: one row per status with count and key range — the
    * audit artifact a 100 TB reconciliation job actually persists. */
  def summarize(
      base: DataFrame, current: DataFrame,
      keyCol: String, digest: Column): DataFrame =
    diff(base, current, keyCol, digest)
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"),
        min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
      .orderBy("status")
}
