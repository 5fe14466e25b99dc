package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 64 MB broadcast threshold: see Verify.scala — the dedup verify
      // joins' per-doc array tables are ~12 MB at sf0.1, just over the
      // 10 MB default; the strategy choice stays size-governed.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // JIT/codegen warmup on the tiny sf0.001 flagship query (untimed):
    // without it the first timed query absorbs ~3-4 s of JVM warmup
    // that belongs to the process, not the operator (standard bench
    // hygiene — measure steady state, not cold start)
    try { SparkEntry.entry(spark).count(); spark.catalog.clearCache() }
    catch { case _: Throwable => () }
    // sorted order + cache clearing between queries: per-query persists
    // (dedup postings etc.) are internal scratch state; letting them
    // accumulate distorts later queries' memory and GC
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable =>
                  Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // incremental stderr progress: a timeout still leaves per-query evidence
      System.err.println(f"[bench] $name%-24s $dt%8.2f s${err.map(" ERR " + _).getOrElse("")}")
      (name, dt, err)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
