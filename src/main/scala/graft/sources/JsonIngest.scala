package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Resilient JSON-lines ingest — the shape of reading a crawl drop at
  * 100 TB, where some lines are garbage and newer shards carry columns
  * older shards lack.
  *
  * Policy choices this helper pins (and why they're the scale-safe
  * ones):
  *
  *  - '''Explicit schema, never inference.''' `spark.read.json` without
  *    a schema runs a WHOLE EXTRA PASS over the data to sample types —
  *    at 100 TB that doubles ingest cost, and a rare late field can
  *    still flip an inferred type between runs. The caller declares the
  *    UNION schema (old + evolved columns); shards missing a column
  *    parse it as null — schema evolution without `mergeSchema`
  *    machinery.
  *  - '''PERMISSIVE + quarantine column, not FAILFAST/DROPMALFORMED.'''
  *    One corrupt line among 10¹¹ must neither kill the job (FAILFAST)
  *    nor vanish silently (DROPMALFORMED). PERMISSIVE parses what it
  *    can, leaves the raw line in the corrupt-record column, and the
  *    pipeline counts/quarantines it downstream — loud AND durable.
  *
  * The corrupt column must be part of the declared schema (Spark drops
  * it otherwise), and queries must reference at least one real column
  * alongside it (a Spark guard rejects corrupt-column-only scans).
  */
object JsonIngest {

  val CorruptCol = "_corrupt"

  /** Read JSON-lines `paths` under the declared `schema` (which should
    * NOT include [[CorruptCol]] — it is appended here), quarantining
    * malformed lines into [[CorruptCol]]. */
  def readResilient(
      spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)
}
