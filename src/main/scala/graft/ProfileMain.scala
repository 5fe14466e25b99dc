package graft

import org.apache.spark.sql.SparkSession

/** CLI twin of the reference's entry point (jar/ProfileJob.java:78-162,
  * `ProfileJob.main`) — profile a table and print the full report, so
  * a user of the reference can point this at their data and get the
  * same statistics surface from one command:
  *
  * {{{
  *   sbt "runMain graft.ProfileMain <path> [topK]"
  * }}}
  *
  * The path dispatches on extension: `.csv` (header + inferred schema),
  * `.json`/`.jsonl`, else parquet. The reference's ParameterTool args
  * map to plain CLI args; its in-memory demo generator corresponds to
  * ProfileSpec's fixture (FIXTURES.md), and the report format matches
  * StatsPojo.toString (print bug #1 fixed, documented). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileMain <path> [topK]")
    val path = args(0)
    val topK = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df =
      if (path.endsWith(".csv"))
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else if (path.endsWith(".json") || path.endsWith(".jsonl"))
        spark.read.json(path)
      else spark.read.parquet(path)
    println(graft.profile.ProfileRunner.report(df, topK))
    spark.stop()
  }
}
