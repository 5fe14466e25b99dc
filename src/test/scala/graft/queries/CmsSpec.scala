package graft.queries

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkSpec

class CmsSpec extends SparkSpec {

  private def events = QueryUtil.table(spark, sfDir, "events")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(
      df.agg(count_min_sketch(col("user_id"), lit(ScaleQueries.CmsEps),
        lit(ScaleQueries.CmsConf), lit(ScaleQueries.CmsSeed)).as("sk"))
        .head.getAs[Array[Byte]](0)))

  test("CMS never underestimates and respects the eps*N bound on every key") {
    val cms = sketchOf(events)
    val bound = math.ceil(ScaleQueries.CmsEps * cms.totalCount()).toLong
    val exact = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.length > 10)
    var overBound = 0
    exact.foreach { case (u, n) =>
      val e = cms.estimateCount(u)
      assert(e >= n, s"user $u underestimated: $e < $n")
      if (e > n + bound) overBound += 1
    }
    // the guarantee is per-query probabilistic (conf 0.99); allow the tail
    assert(overBound <= math.max(1, exact.length / 50),
      s"$overBound of ${exact.length} keys exceed the eps*N bound")
  }

  test("per-day sketches merge into the global sketch exactly") {
    val withDay = events.withColumn("day",
      expr(s"(${QueryUtil.eventTsUsExpr(events.schema, "ts")}) div 86400000000"))
    val days = withDay.select("day").distinct().collect().map(_.getLong(0))
    assert(days.length > 1, "fixture must span multiple days")
    val merged = days.sorted.map { d =>
      sketchOf(withDay.filter(col("day") === d))
    }.reduce { (a, b) => a.mergeInPlace(b); a }
    val global = sketchOf(events)
    assert(merged.totalCount() == global.totalCount())
    val probes = events.select("user_id").distinct()
      .orderBy("user_id").limit(50).collect().map(_.getLong(0))
    probes.foreach { u =>
      assert(merged.estimateCount(u) == global.estimateCount(u), s"user $u")
    }
  }

  test("q103: all probe rows within bound, deterministic across runs") {
    val a = ScaleQueries.cmsFreq(spark, sfDir).collect()
    assert(a.length == ScaleQueries.CmsProbes)
    assert(a.forall(_.getBoolean(2)), "every probe estimate must be in bound")
    val b = ScaleQueries.cmsFreq(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
