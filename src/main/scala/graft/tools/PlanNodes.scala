package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the physical node classes of a query plan (debugging
  * plan-spec traversal). Not part of the driver contract. */
object PlanNodes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      println("  " * d + p.getClass.getName)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, d + 1)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          println("  " * (d + 1) + "[cachedPlan:]")
          walk(m.relation.cachedPlan, d + 1)
        case other => other.children.foreach(walk(_, d + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
