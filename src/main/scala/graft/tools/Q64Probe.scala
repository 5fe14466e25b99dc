package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: q64 stage split — candidate generation vs exact verify. */
object Q64Probe {
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
    for (n <- Seq(8, 10, 12, 16); rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val (cand, _, scratch) = graft.dedup.NgramJaccard.containmentCandidates(
        docs, "doc_id", "text", n, 0.6)
      val nCand = cand.count()
      val tCand = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val res = graft.dedup.NgramJaccard.containmentPairsResult(
        docs, "doc_id", "text", n, 0.6)
      val nOut = res.df.count()
      val tFull = (System.nanoTime() - t0) / 1e9
      println(f"[q64probe] n=$n rep $rep: candidates=$nCand in $tCand%.2f s; " +
        f"full=$nOut in $tFull%.2f s")
      res.release(); scratch.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
