package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[QueryUtil.eventTsUs]]/[[QueryUtil.eventTs]]/[[QueryUtil.eventHourEpoch]]
  * pin the schema dispatch that survived the fixture's ts-type drift
  * (epoch-nanos LONG → timestamp[us]): identical epoch micros whichever
  * physical type the parquet carries. Session tz is UTC (SparkSpec), so
  * the NTZ branch's naive-as-UTC reading matches DuckDB's `epoch_us`.
  */
class EventTsSpec extends SparkSpec {

  // 2024-01-02T03:04:05.123456789 UTC: epoch micros floor = …123456
  private val wallUs = 1704164645123456L
  private val wallNs = wallUs * 1000L + 789L

  test("eventTsUs: long epoch-nanos floors to micros") {
    val s = spark; import s.implicits._
    val df = Seq(wallNs, -1L, 0L).toDF("ts")
    val got = df.select(QueryUtil.eventTsUs(df)).collect().map(_.getLong(0)).toSeq
    // floor, not truncate-toward-zero: -1 ns lands in micro -1, not 0
    assert(got == Seq(wallUs, -1L, 0L))
  }

  test("eventTsUs: TIMESTAMP column reads its storage micros") {
    val s = spark; import s.implicits._
    val df = Seq(wallUs).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val got = df.select(QueryUtil.eventTsUs(df)).head().getLong(0)
    assert(got == wallUs)
  }

  test("eventTsUs: TIMESTAMP_NTZ reads naive-as-UTC epoch micros") {
    val s = spark; import s.implicits._
    val df = Seq("2024-01-02 03:04:05.123456").toDF("w")
      .select(expr("cast(w as timestamp_ntz)").as("ts"))
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    val got = df.select(QueryUtil.eventTsUs(df)).head().getLong(0)
    assert(got == wallUs)
  }

  test("eventTs/eventHourEpoch agree across all three physical types") {
    val s = spark; import s.implicits._
    val long = Seq(wallNs).toDF("ts")
    val tsz = Seq(wallUs).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val ntz = Seq("2024-01-02 03:04:05.123456").toDF("w")
      .select(expr("cast(w as timestamp_ntz)").as("ts"))
    val results = Seq(long, tsz, ntz).map { df =>
      df.select(
          unix_micros(QueryUtil.eventTs(df)).as("us"),
          QueryUtil.eventHourEpoch(df).as("h"))
        .head()
    }
    results.foreach { r =>
      assert(r.getLong(0) == wallUs)
      assert(r.getLong(1) == (wallUs / 1000000L / 3600L) * 3600L)
    }
  }

  test("eventTsUs rejects an unsupported ts type with a clear error") {
    val s = spark; import s.implicits._
    val df = Seq("not-a-time").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      QueryUtil.eventTsUs(df)
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
