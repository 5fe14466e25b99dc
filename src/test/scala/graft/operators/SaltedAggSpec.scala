package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

import scala.util.Random

class SaltedAggSpec extends SparkSpec {

  test("salted distinct equals plain countDistinct on skewed data") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // one hot key carrying most of the distinct universe + a cold tail
    val rows = Seq.fill(5000)(("hot", rnd.nextInt(800).toLong)) ++
      Seq.fill(500)((s"cold${rnd.nextInt(10)}", rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v")
    val got = SaltedAgg.distinctCount(df, Seq("k"), "v", 16, "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").agg(countDistinct(col("v")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("null values are ignored, null-only keys count zero") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(1L)),
        ("b", None), ("b", None))
      .toDF("k", "v")
    val got = SaltedAgg.distinctCount(df, Seq("k"), "v", 4, "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }

  test("skew join equals the plain inner join (skew, misses, null salt src)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    // hot key 1, cold keys, probe keys missing from build, null salt col
    val probe = (Seq.fill(2000)((1L, Option(rnd.nextLong()))) ++
      Seq.fill(200)((rnd.nextInt(20).toLong + 2, Option(rnd.nextLong()))) ++
      Seq((3L, None), (999L, Option(1L)))).toDF("pk", "src")
    val build = (1L to 15L).map(k => (k, s"v$k")).toDF("bk", "bv")
    val got = SaltedAgg.skewJoin(probe, build, "pk", "bk", "src", 8)
      .groupBy("pk", "bv").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = probe.join(build, col("pk") === col("bk"))
      .groupBy("pk", "bv").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("nSalts = 1 degenerates to the plain aggregate") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L)).toDF("k", "v")
    val got = SaltedAgg.distinctCount(df, Seq("k"), "v", 1, "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
