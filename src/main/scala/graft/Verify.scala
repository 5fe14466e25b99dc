package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one-file-per-bucket sorted scans (BucketedTables.writeBucketed
      // guarantees the layout); lets bucketed merge joins skip the Sort
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // Local-mode sizing: a single 8g JVM affords 64 MB broadcasts.
      // The library never forces a join strategy (no broadcast hints on
      // corpus-derived tables); this threshold lets the planner pick
      // broadcast for the ~12 MB per-doc array tables the dedup verify
      // stages join — on a real cluster the same decision stays
      // size-governed and flips to shuffle as the corpus grows.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-loop filter: SPARK_GRAFT_ONLY=q109,q110 dumps that subset
    // (the driver leaves it unset and gets the full surface).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Dump queries on a small fixed pool: the dumps are independent
    // Spark jobs and each leaves the cluster under-utilized in its
    // tail (coalesce(1) write, streaming start/stop latency), so 4-way
    // overlap roughly halves wall time. Spark schedules concurrent
    // jobs from one session safely; per-query state (temp view names,
    // write-once caches) is either distinct per query or synchronized.
    // Force the whole query-object graph to initialize HERE, on one
    // thread, before the pool starts: concurrent first-touch of the
    // query objects from pool threads can deadlock on class-init
    // monitors if any init-time reference chain runs between them
    // (the SQL vals cite each other's fragments/constants; JVM clinit
    // is re-entrant per thread but a mutual-wait across threads is
    // fatal). Evaluating oracleSql touches every object's vals.
    SparkEntry.oracleSql
    val todo = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt.max(1))
    val tasks = todo.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(s"[verify] $name ok")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
