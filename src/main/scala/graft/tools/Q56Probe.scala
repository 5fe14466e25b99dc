package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: old-vs-new q56 composition timing in one JVM. */
object Q56Probe {
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
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q56probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    for (i <- 1 to 3) {
      time(s"old rep $i") {
        val pairs = graft.queries.PipelineQueries.dedupMinhash(spark, sfDir)
          .select(col("doc_a"), col("doc_b"))
        graft.operators.ConnectedComponents
          .components(pairs, "doc_a", "doc_b", partitions = 8)
          .groupBy(col("comp").as("cluster_rep"))
          .agg(count(lit(1)).as("n_members"), sum(col("id")).as("id_checksum"))
          .orderBy("cluster_rep").count()
      }
      time(s"new rep $i") {
        graft.queries.ScaleQueries.dedupClusters(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
