package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: print the approximate-query accuracy-claim rows
  * (q22/q35/q48/q59) at each given SF dir, so bound regressions show
  * up without a full Verify run. Not part of the driver contract. */
object BoundProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      println(s"===== $dir")
      println("-- q22"); graft.queries.AnalyticsQueries.approxDistinct(spark, dir).show(false)
      println("-- q35"); graft.queries.AnalyticsQueries.quartilesOutliersApprox(spark, dir).show(false)
      println("-- q48"); graft.queries.ScaleQueries.hllCube(spark, dir).show(false)
      println("-- q59 (violations only)")
      graft.queries.ScaleQueries.streamWindowDistinct(spark, dir)
        .filter("NOT within_bound").show(50, false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
