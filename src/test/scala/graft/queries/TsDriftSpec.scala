package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-6 failure mode: the driver regenerated
  * `events.parquet` with `ts` as plain `timestamp[us]` (previously
  * TIMESTAMP(NANOS) read as LONG under `nanosAsLong`), and every site
  * doing integer arithmetic on `ts` failed analysis. Event-time access
  * now dispatches on the schema ([[QueryUtil.eventTsUsExpr]]); this
  * spec proves the same query answers identically whatever physical
  * type the parquet carries.
  */
class TsDriftSpec extends SparkSpec {

  private def run(dir: String): Seq[Seq[Any]] =
    AnalyticsQueries.eventsHourly(spark, dir).collect().map(_.toSeq).toSeq

  test("q19 answers identically on long-nanos, TIMESTAMP_NTZ, and TIMESTAMP ts") {
    val base = run(sfDir)
    assert(base.nonEmpty)

    val ev = QueryUtil.table(spark, sfDir, "events")
    val us = QueryUtil.eventTsUs(ev)

    for ((variant, c) <- Seq(
        "long_nanos" -> (us * lit(1000L)),
        "ntz" -> timestamp_micros(us).cast("timestamp_ntz"),
        "ltz" -> timestamp_micros(us))) {
      val dir = Files.createTempDirectory(s"tsdrift_$variant").toFile
      dir.deleteOnExit()
      val out = s"$dir/rewritten"
      ev.withColumn("ts", c).write.parquet(s"$out/events.parquet")
      val got = run(out)
      assert(got == base, s"variant $variant diverged")
    }
  }

  test("eventTsUs dispatches on every supported type and rejects others") {
    val ev = QueryUtil.table(spark, sfDir, "events")
    val us = ev.select(QueryUtil.eventTsUs(ev).as("us"))
      .agg(sum("us")).head.getLong(0)
    val asTs = ev.withColumn("ts", timestamp_micros(QueryUtil.eventTsUs(ev)))
    val us2 = asTs.select(QueryUtil.eventTsUs(asTs).as("us"))
      .agg(sum("us")).head.getLong(0)
    assert(us == us2, "long-nanos and TIMESTAMP paths must agree to the micro")
    val bad = ev.withColumn("ts", col("ts").cast("string"))
    intercept[IllegalArgumentException] {
      QueryUtil.eventTsUs(bad)
    }
  }
}
