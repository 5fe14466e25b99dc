package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column-level schema drift at ingest — the companion to
  * TsDriftSpec's type drift: a crawl that adds a `quality` column in
  * its second batch must remain readable as ONE table. Two engine
  * answers exist and both are pinned: `mergeSchema` at the parquet
  * source (footer-level union, old files surface nulls) and
  * `unionByName(allowMissingColumns)` at the DataFrame level.
  */
class SchemaDriftSpec extends SparkSpec {

  test("mergeSchema unions drifted parquet batches; old rows null-fill") {
    import spark.implicits._
    val dir = Files.createTempDirectory("schemadrift").toFile
    dir.deleteOnExit()
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.4))
      .toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(
      s"$dir/batch=1", s"$dir/batch=2")
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    assert(merged.count() == 4)
    val nulls = merged.filter(col("quality").isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(nulls.toSeq == Seq(1L, 2L), "v1 rows must null-fill the new column")
    // the drifted column is usable immediately (null-safe aggregates)
    assert(merged.agg(avg("quality")).head.getDouble(0) == 0.65)
  }

  test("unionByName(allowMissingColumns) gives the same table without re-reading") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val v2 = Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.columns.toSet == Set("doc_id", "text", "quality"))
    assert(u.filter(col("quality").isNull).count() == 2)
    // order of sides must not change the schema contract
    val u2 = v2.unionByName(v1, allowMissingColumns = true)
    assert(u2.columns.toSet == u.columns.toSet && u2.count() == u.count())
  }
}
