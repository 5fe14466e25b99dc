package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(1)
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
