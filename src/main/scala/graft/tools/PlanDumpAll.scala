package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump `.explain("formatted")` for a list of queries to
  * files — `args = outDir suffix sfDir q1 q2 ...`. Session config
  * mirrors Bench so the dumped plans are the benched plans. Not part
  * of the driver contract. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val qs = args.drop(3)
    outDir.mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs.foreach { q =>
      val txt = try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"PLAN FAILED: $e" }
      val f = new java.io.File(outDir, s"${q}_$suffix.txt")
      java.nio.file.Files.write(f.toPath, txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $f (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
