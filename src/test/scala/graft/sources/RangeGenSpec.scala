package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The q300 connector's plan-level claims: pushdown really narrows the
  * source, pruning really shrinks the read schema and the partition
  * plan, and values equal the formula. */
class RangeGenSpec extends SparkSpec {

  private def read(rows: Long): DataFrame =
    spark.read.format("graft.sources.RangeGen")
      .option("rows", rows.toString).load()

  private def scanOf(df: DataFrame): BatchScanExec = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case s: BatchScanExec => Seq(s)
        case other => other.children.flatMap(unwrap)
      }
    val scans = unwrap(df.queryExecution.executedPlan)
    assert(scans.size == 1, s"expected one BatchScanExec, got $scans")
    scans.head
  }

  test("values equal the generator formula, full span") {
    val got = read(1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 1000)
    got.foreach { case (id, b, v) =>
      assert(b == RangeGen.bucketOf(id) && v == RangeGen.valueOf(id))
    }
    assert(got.map(_._1).toSeq == (0L until 1000L))
  }

  test("filter pushdown narrows the generated span inside the source") {
    val df = read(1000000L).filter(col("id") >= 100L && col("id") < 300L)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("[100, 300)"),
      s"range not pushed: ${scan.scan.description()}")
    assert(df.count() == 200L)
  }

  test("partition plan is proportional to the pushed span") {
    val full = scanOf(read(1000000L)).inputRDD.getNumPartitions
    val tenth = scanOf(read(1000000L)
      .filter(col("id") < 100000L)).inputRDD.getNumPartitions
    assert(full == math.ceil(1000000.0 / RangeGen.SliceRows).toInt)
    assert(tenth == math.ceil(100000.0 / RangeGen.SliceRows).toInt,
      s"pruning did not shrink the plan: $tenth of $full")
  }

  test("column pruning reaches the reader") {
    val df = read(100000L).select(sum(col("value")))
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("value"),
      s"read schema not pruned: ${scan.scan.readSchema()}")
    // pruned read still computes the right values
    val want = (0L until 100000L).map(RangeGen.valueOf).sum
    assert(df.collect().head.getLong(0) == want)
  }

  test("equality pushdown plans a single-row span") {
    val df = read(1000000L).filter(col("id") === 424242L)
    assert(scanOf(df).scan.description().contains("[424242, 424243)"))
    val row = df.collect()
    assert(row.length == 1 && row.head.getLong(0) == 424242L)
  }
}
