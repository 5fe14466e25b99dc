package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pin session_window's gap-boundary semantics (does an event
  * exactly `gap` after the previous merge?). Not shipped. */
object SessProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val df = Seq((1L, 0L), (1L, 60L), (2L, 0L), (2L, 59L), (3L, 0L), (3L, 61L))
      .toDF("uid", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    df.groupBy(col("uid"), session_window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"))
      .orderBy("uid").show(false)
    spark.stop()
  }
}
