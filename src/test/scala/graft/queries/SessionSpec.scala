package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sessionization (q37) boundary semantics and streaming dedup (q36)
  * batch parity. */
class SessionSpec extends SparkSpec {

  test("session_window boundary: exactly-gap merges, gap+1 splits") {
    // pinned by experiment (tools probe) and relied on by the DuckDB
    // oracle's `ts - prev > gap` new-session predicate: if this ever
    // flips, q37's oracle must flip with it
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L), (1L, 60L), (3L, 0L), (3L, 61L))
      .toDF("uid", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val n = df.groupBy(col("uid"), session_window(col("ts"), "60 seconds"))
      .agg(count(lit(1)))
      .groupBy("uid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 1L, "event at exactly gap must merge into the session")
    assert(n(3L) == 2L, "event at gap+1s must start a new session")
  }

  test("q37 sessions partition the events exactly") {
    val sess = AnalyticsQueries.sessionization(spark, sfDir)
    val total = sess.agg(sum("n_events")).head().getLong(0)
    val events = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(total == events, "every event in exactly one session")
    // sessions of one user never overlap: start >= previous start + gap
    val rows = sess.select("user_id", "session_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { case (u, ss) =>
      val starts = ss.map(_._2).sorted
      starts.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a > 12L * 3600 * 1000000, s"user $u sessions overlap")
        case _ => ()
      }
    }
  }

  test("q36 streaming dedup equals batch distinct") {
    val got = PipelineQueries.streamDedup(spark, sfDir).count()
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(md5(col("text"))).distinct().count()
    assert(got == want)
  }
}
