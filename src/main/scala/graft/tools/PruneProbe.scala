package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: show the q47 partition-pruned scan plan. */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.ScaleQueries.partitionPrune(spark, "/root/testdata/sf0.001")
    println("ROWS=" + df.count())
    df.show(8, false)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
