package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming windowed profiles == batch aggregation of the same data —
  * the incremental-maintenance guarantee the commutative/associative
  * moment merge buys (SURVEY.md §2.11). Out-of-order delivery across
  * micro-batches exercises state merge, not just append. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed moments over MemoryStream equal batch computation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "key", "value")
    val agg = StreamingProfile.windowedMoments(
      df, "ts", "key", "value", "10 minutes", "5 minutes")

    val q = agg.writeStream.format("memory")
      .queryName("stream_moments_test").outputMode("complete").start()
    try {
      // batch 1: in-order
      input.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(11), "a", 10.0))
      q.processAllAvailable()
      // batch 2: late + second key — merges into existing window state
      input.addData((ts(3), "a", 3.0), (ts(14), "b", 7.0), (ts(4), "b", 4.0))
      q.processAllAvailable()

      val got = spark.table("stream_moments_test")
        .orderBy("window_start", "key")
        .select("key", "n", "mean", "var_pop", "min", "max")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

      val all = Seq(
        (ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(11), "a", 10.0),
        (ts(3), "a", 3.0), (ts(14), "b", 7.0), (ts(4), "b", 4.0))
      val want = all.groupBy(t => (t._1.getTime / 600000, t._2)).toSeq
        .sortBy(_._1)
        .map { case ((_, k), rows) =>
          val vs = rows.map(_._3)
          val mean = vs.sum / vs.size
          val varPop = vs.map(v => (v - mean) * (v - mean)).sum / vs.size
          (k, vs.size.toLong, mean, varPop, vs.min, vs.max)
        }
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2)
        assert(math.abs(g._3 - w._3) < 1e-9)
        assert(math.abs(g._4 - w._4) < 1e-9)
        assert(g._5 == w._5 && g._6 == w._6)
      }
    } finally q.stop()
  }

  test("windowedStats append mode with watermark emits finalized windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingProfile.windowedStats(
      input.toDF().toDF("ts", "key", "value"),
      "ts", "key", "value", "10 minutes", "1 minutes")
    val q = agg.writeStream.format("memory")
      .queryName("stream_append_test").outputMode("append").start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(5), "a", 5.0))
      q.processAllAvailable()
      // advance watermark far past the first window -> it finalizes
      input.addData((ts(59), "a", 9.0))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("stream_append_test").collect()
      assert(rows.exists(r => r.getAs[Long]("n_events") == 2L),
        "first window should have been finalized with both events")
    } finally q.stop()
  }
}
