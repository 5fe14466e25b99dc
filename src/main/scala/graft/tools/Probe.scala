package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch harness: stage-level breakdown of a query — one warm
  * session, a listener that prints per-job / per-stage wall, task-time
  * and shuffle volumes. Not part of the driver contract; exists so
  * optimization rounds can attribute seconds to stages instead of
  * guessing from totals. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q18_join_revenue_nation")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    // A/B config overrides, e.g. GRAFT_PROBE_CONF="spark.sql.adaptive.enabled=false,spark.sql.shuffle.partitions=8"
    sys.env.get("GRAFT_PROBE_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var collecting = false
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (collecting) {
        val dt = jobStart.get(je.jobId)
          .map(t0 => (System.nanoTime() - t0) / 1e9).getOrElse(-1.0)
        println(f"[job] id=${je.jobId}%-4d wall=$dt%6.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          println(f"[stage] ${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
            f"run=${tm.executorRunTime / 1e3}%7.2f s " +
            f"cpu=${tm.executorCpuTime / 1e9}%7.2f s " +
            f"shufR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.2f MB " +
            f"shufW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.2f MB  " +
            si.name.takeWhile(_ != '\n').take(90))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = graft.SparkEntry.queries(name)
    // warm run, untimed, listener off
    fn(spark, sfDir).count(); spark.catalog.clearCache()
    for (i <- 1 to reps) {
      collecting = i == reps // only trace the last (warmest) rep
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
