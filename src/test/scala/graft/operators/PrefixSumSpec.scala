package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  private def data(n: Int) = {
    val s = spark
    import s.implicits._
    // irregular values, ids with gaps (monotone bucketing must not
    // assume density)
    (1 to n).map(i => (i.toLong * 3 + (i % 5), (i % 97).toLong + 1))
      .toDF("id", "v")
  }

  test("two-phase prefix sum equals the single-partition global window") {
    val df = data(5000)
    val got = PrefixSum.withPrefixSum(df, "id", "v", expr("id div 100"))
      .select("id", "cum", "pre")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    val expect = df.withColumn("cum", sum("v").over(w))
      .withColumn("pre", col("cum") - col("v"))
      .select("id", "cum", "pre")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("no single-partition exchange in the plan (the scale claim)") {
    val df = data(1000)
    val res = PrefixSum.withPrefixSum(df, "id", "v", expr("id div 50"))
    res.collect()
    val p = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("Window"), p) // intra-bucket window is still a window
  }

  test("bucket granularity does not change the result") {
    val df = data(800)
    def at(b: Int) = PrefixSum
      .withPrefixSum(df, "id", "v", expr(s"id div $b"))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(at(10) == at(1000))
    // single bucket degenerates to the plain window, still correct
    assert(at(Int.MaxValue) == at(10))
  }
}
