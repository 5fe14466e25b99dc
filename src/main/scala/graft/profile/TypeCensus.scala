package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Type-inference census for string columns: how many non-blank values
  * parse as boolean / int / long / float / double / date
  * (reference: org/apache/flink/stats/StatsPojo.java:306-381).
  *
  * Semantics notes (documented deviations, pinned by tests):
  *  - boolean counts ONLY case-insensitive "true" (Boolean.parseBoolean,
  *    reference StatsPojo.java:320-324) — "false" does not count, and the
  *    value is not trimmed first.
  *  - int/long use Java `parseInt`/`parseLong` grammar: optional sign,
  *    digits only, range-checked (via decimal cast, overflow-safe).
  *  - float/double use the decimal subset of the Java grammar: optional
  *    sign, decimal literal with optional exponent and optional f/F/d/D
  *    suffix, or NaN/Infinity. Hex float literals (a Java quirk) are NOT
  *    recognized — deviation documented. Float overflow still parses
  *    (Infinity) in Java, so float and double censuses agree by
  *    construction for any non-hex literal.
  *  - dates use the reference's 7 strict patterns
  *    (StatsPojo.java:373-381) with fixed-width shapes + calendar
  *    validation (DateUtils.parseDateStrictly analogue).
  *
  * All predicates are generated from shared constants into BOTH Spark SQL
  * and DuckDB SQL text so the engine and the oracle cannot drift. The
  * census operates on a *named* column of the input plan (materialize
  * derived expressions with `withColumn` first).
  */
object TypeCensus {

  val intRegex = "^[+-]?[0-9]+$"
  val floatRegex =
    "^[+-]?(NaN|Infinity|(([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?[fFdD]?))$"

  /** (shape regex, Spark datetime patterns, DuckDB strptime formats).
    * Shapes with two candidate patterns (dd/MM vs MM/dd) count once if
    * either parses, mirroring parseDateStrictly's first-success return. */
  val dateShapes: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("^[0-9]{4}-[0-9]{2}-[0-9]{2}$", Seq("yyyy-MM-dd"), Seq("%Y-%m-%d")),
    ("^[0-9]{8}$", Seq("yyyyMMdd"), Seq("%Y%m%d")),
    ("^[0-9]{4}/[0-9]{2}/[0-9]{2}$", Seq("yyyy/MM/dd"), Seq("%Y/%m/%d")),
    ("^[0-9]{2}/[0-9]{2}/[0-9]{4}$", Seq("dd/MM/yyyy", "MM/dd/yyyy"),
      Seq("%d/%m/%Y", "%m/%d/%Y")),
    ("^[0-9]{2}-[0-9]{2}-[0-9]{4}$", Seq("dd-MM-yyyy", "MM-dd-yyyy"),
      Seq("%d-%m-%Y", "%m-%d-%Y")))

  private val longMin = "-9223372036854775808"
  private val longMax = "9223372036854775807"

  /** Predicate SQL, parameterized by dialect. `tryToDate(fmt)` renders the
    * dialect's null-on-failure date parse of `col` with pattern index i. */
  private def predicates(col: String, duck: Boolean): Map[String, String] = {
    def rx(r: String) =
      if (duck) s"regexp_matches($col, '$r')" else s"regexp_like($col, '$r')"
    val decCast =
      if (duck) s"try_cast($col AS DECIMAL(38,0))"
      else s"try_cast($col as decimal(38,0))"
    val dateOk = dateShapes.map { case (shape, sparkFmts, duckFmts) =>
      val fmts = if (duck) duckFmts else sparkFmts
      val parses = fmts.map { f =>
        if (duck) s"try_strptime($col, '$f') IS NOT NULL"
        else s"try_to_timestamp($col, '$f') IS NOT NULL"
      }.mkString(" OR ")
      s"(${rx(shape)} AND ($parses))"
    }.mkString("(", " OR ", ")")
    Map(
      "eligible" -> s"($col IS NOT NULL AND trim($col) <> '')",
      "boolean_values" -> s"(lower($col) = 'true')",
      "int_values" ->
        s"(${rx(intRegex)} AND $decCast BETWEEN ${Int.MinValue} AND ${Int.MaxValue})",
      "long_values" ->
        s"(${rx(intRegex)} AND $decCast BETWEEN $longMin AND $longMax)",
      "float_values" -> s"(${rx(floatRegex)})",
      "double_values" -> s"(${rx(floatRegex)})",
      "date_values" -> dateOk)
  }

  val counterNames: Seq[String] = Seq(
    "boolean_values", "int_values", "long_values",
    "float_values", "double_values", "date_values")

  /** Spark aggregate columns `<prefix>boolean_values .. date_values`. */
  def censusAggs(colName: String, prefix: String = ""): Seq[Column] = {
    val p = predicates(colName, duck = false)
    counterNames.map { k =>
      sum(when(expr(p("eligible")) && expr(p(k)), 1L).otherwise(0L))
        .as(s"$prefix$k")
    }
  }

  /** DuckDB aggregate SQL snippets, same aliases as [[censusAggs]]. */
  def sqlCensusAggs(colName: String, prefix: String = ""): Seq[String] = {
    val p = predicates(colName, duck = true)
    counterNames.map { k =>
      s"sum(CASE WHEN ${p("eligible")} AND ${p(k)} THEN 1 ELSE 0 END)::BIGINT AS $prefix$k"
    }
  }
}
