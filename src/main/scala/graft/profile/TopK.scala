package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PatternMask

/** Top-K most frequent values and character-class patterns per string
  * column (reference: jar/ProfileJob.java:183-216).
  *
  * The reference sorts ALL grouped counts on a parallelism-1 task then
  * takes the first K (jar/ProfileJob.java:195-196 — a deliberate gather
  * bottleneck). Spark-native design instead:
  *
  *  - single column: `groupBy(col).count().orderBy(...).limit(k)` —
  *    Catalyst plans `TakeOrderedAndProject`: per-partition partial top-K
  *    merged on the driver, no global sort, no gather stage.
  *  - all string columns at once: melt to long format
  *    `(col_name, value)` with `stack`, ONE aggregation shuffle keyed by
  *    (col_name, value), then a per-column `row_number` window. Partial
  *    (map-side) aggregation absorbs heavy hitters before the shuffle,
  *    so skewed top values (the common case — that's why they're "top")
  *    cost no skewed shuffle.
  *
  * Tie-break: the reference's sort is unstable/unspecified; we DEFINE
  * (count DESC, value ASC) for determinism (SURVEY.md §7.3).
  */
object TopK {

  /** Top-K for one column: distributed partial top-K (TakeOrderedAndProject). */
  def topKValues(df: DataFrame, colName: String, k: Int = 20): DataFrame =
    df.filter(col(colName).isNotNull)
      .groupBy(col(colName).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(k)

  def topKPatterns(df: DataFrame, colName: String, k: Int = 20): DataFrame =
    df.filter(col(colName).isNotNull)
      .groupBy(PatternMask.pattern_mask(col(colName)).as("pattern"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pattern"))
      .limit(k)

  /** Melted long-format `(col_name, value)` over the given string columns
    * — one scan for all columns. */
  def melt(df: DataFrame, strCols: Seq[String]): DataFrame = {
    val args = strCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(stack(
        (Seq(lit(strCols.size)) ++ args): _*
      ).as(Seq("col_name", "value")))
      .filter(col("value").isNotNull)
  }

  /** All columns' top-K values in ONE job:
    * melt -> groupBy(col_name, value) -> per-column row_number <= k.
    * Output: (col_name, value, cnt, rank). */
  def topKValuesAll(df: DataFrame, strCols: Seq[String], k: Int = 20): DataFrame = {
    val counts = melt(df, strCols)
      .groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy(desc("cnt"), asc("value"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Same, over the pattern mask of each value. */
  def topKPatternsAll(df: DataFrame, strCols: Seq[String], k: Int = 20): DataFrame = {
    val counts = melt(df, strCols)
      .withColumn("pattern", PatternMask.pattern_mask(col("value")))
      .groupBy("col_name", "pattern").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name").orderBy(desc("cnt"), asc("pattern"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("col_name", "pattern", "cnt", "rank")
  }
}
