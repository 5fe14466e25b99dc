package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query surface.
  *
  * Conventions that make the DuckDB oracle hash-compare deterministic
  * (see SURVEY.md §7.3):
  *  - every floating aggregate is rounded to a fixed scale in BOTH
  *    engines (sum-of-double differences are ~1e-12 relative; rounding
  *    removes them);
  *  - money-like sums go through DECIMAL(18,2) so they are exact and
  *    order-independent, then back to DOUBLE for a stable type;
  *  - every query output has an explicit total ORDER BY;
  *  - aggregate/computed columns are aliased identically in both engines.
  */
object QueryUtil {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact order-independent sum of a money-valued double expression.
    *
    * Per-row quantization must be a pure IEEE-deterministic function of
    * the double so Spark and the DuckDB oracle agree bit-for-bit:
    * `floor(x*100)` is (decimal casts round the *shortest string repr*
    * in the JVM but the *true binary value* in DuckDB — they disagree on
    * .xx5-straddling doubles). The cent sum is an exact integer; the
    * final /100 is a single deterministic IEEE division. */
  def moneySum(c: Column): Column =
    (sum(floor(c * lit(100d)).cast("long")).cast("double") / lit(100d))

  /** DuckDB rendering of [[moneySum]]. */
  def moneySumSql(expr: String): String =
    s"(sum(floor(($expr) * 100)::BIGINT)::DOUBLE / 100)"

  def r6(c: Column): Column = round(c, 6)

  /** A literal comparable with a parquet timestamp column regardless of
    * whether Spark mapped it to TIMESTAMP or TIMESTAMP_NTZ. */
  def tsLit(df: DataFrame, colName: String, value: String): Column =
    lit(value).cast(df.schema(colName).dataType)
}
