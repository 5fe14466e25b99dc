package graft.profile

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[graft.ProfileMain.streamProfile]] (the `--stream` CLI mode): the
  * windowed Pébay moments computed INCREMENTALLY by a real streaming
  * query must equal the batch windowedMoments of the same slice —
  * associative-commutative merge is the whole contract, so any drift
  * between incremental state merges and the batch aggregate fails
  * here. */
class StreamProfileMainSpec extends SparkSpec {

  test("--stream profile equals the batch profile of the same slice") {
    val path = s"$sfDir/events.parquet"
    val streamed = graft.ProfileMain
      .streamProfile(spark, path, "ts", "event_type", "value")
      .collect()
    assert(streamed.nonEmpty, "stream profile produced no windows")

    val ev0 = spark.read.parquet(path)
    val batch = graft.streaming.StreamingProfile.windowedMoments(
        ev0.withColumn("__event_ts", graft.queries.QueryUtil.eventTs(ev0)),
        "__event_ts", "event_type", "value")
      .orderBy(col("window_start"), col("event_type"))
      .collect()

    assert(streamed.length == batch.length,
      s"row counts differ: stream ${streamed.length} vs batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0) && s.getString(1) == b.getString(1),
        s"window/key drift: $s vs $b")
      assert(s.getLong(2) == b.getLong(2), s"n drift: $s vs $b")
      // moments merged incrementally across state updates vs one batch
      // pass: identical up to float merge order — compare at 1e-9 rel
      val momentCols = Seq("mean", "var_pop", "skew_pop", "kurt_pop", "min", "max")
      momentCols.foreach { c =>
        val (x, y) = (s.getAs[Double](c), b.getAs[Double](c))
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"moment $c drift: $x vs $y in $s")
      }
      // the exact cent sum is integer state — must agree exactly
      assert(s.getAs[Long]("sum_cents") == b.getAs[Long]("sum_cents"))
    }
  }

  test("--stream mode handles a long epoch-nanos ts column the same way") {
    // the dispatch is QueryUtil.eventTs — already pinned per-type in
    // EventTsSpec; here: end-to-end through the streaming entry on a
    // crafted long-ts parquet
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_profile").toString
    Seq(
      (1704067200000000000L, "a", 1.0), (1704067201000000000L, "a", 3.0),
      (1704070800000000000L, "b", 5.0))
      .toDF("ts", "k", "v").write.mode("overwrite").parquet(dir)
    val out = graft.ProfileMain.streamProfile(spark, dir, "ts", "k", "v").collect()
    assert(out.length == 2)
    assert(out.head.getLong(2) == 2 && out.head.getDouble(3) == 2.0) // n, mean of (1,3)
  }
}
