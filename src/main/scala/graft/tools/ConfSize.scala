package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: how big is the Hadoop Configuration each task
  * broadcast gzips? (Thread dumps of streaming gates showed the stream
  * execution thread inside SerializableConfiguration.writeObject →
  * GZIP deflate — per-batch driver overhead ∝ this size.) */
object ConfSize {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def measure(tag: String): Unit = {
      val conf = spark.sessionState.newHadoopConf()
      var n = 0
      val it = conf.iterator(); while (it.hasNext) { it.next(); n += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      conf.write(out); out.flush()
      val t0 = System.nanoTime()
      val gz = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(bos.toByteArray); g.finish()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[confsize] $tag entries=$n raw=${bos.size()} gz=${gz.size()} gzip_ms=$ms%.1f")
    }
    measure("fresh session")
    // after running a query that touches the staged-stream machinery
    graft.SparkEntry.queries("q18_join_revenue_nation")(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")).count()
    measure("after q18")
    graft.SparkEntry.queries("q267_stream_outer_join")(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")).count()
    measure("after q267")
    spark.stop()
  }
}
