package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time one query N times to separate JVM/codegen
  * warmup from steady-state execution. Not part of the driver contract. */
object Timing {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q18_join_revenue_nation")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one-file-per-bucket sorted scans (BucketedTables.writeBucketed
      // guarantees the layout); lets bucketed merge joins skip the Sort
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // match Bench/Verify session sizing (see Verify.scala)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "WARN"))
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      fn(spark, sfDir).explain("formatted")
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timing] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      // mirror Bench: each rep builds fresh persisted scratch (postings
      // etc.); without clearing, rep N runs against N-1 stale caches
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
