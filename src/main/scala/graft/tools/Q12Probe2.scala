package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: q12 timing vs gram length (candidate economics). */
object Q12Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (n <- Seq(9, 12, 16); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val res = graft.dedup.NgramJaccard.similarPairs(docs, "doc_id", "text", n, 0.7)
      val out = res.count()
      println(f"[q12probe] n=$n rep $rep: pairs=$out in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
