package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries => A, ProfileQueries => P}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY.md
  * §2 (or the LLM-pipeline extension surface); entries with an equivalent
  * ANSI-SQL formulation also appear in [[oracleSql]] for the DuckDB
  * correctness gate. Column aliases and ORDER BYs match pairwise by
  * construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    A.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (A.pricingSummary _),
    "q02_profile_numeric" -> (P.profileNumeric _),
    "q03_profile_orders" -> (P.profileOrders _),
    "q04_complete_records" -> (P.completeRecords _),
    "q05_length_stats" -> (P.lengthStats _),
    "q06_type_census" -> (P.typeCensus _),
    "q07_topk_values" -> (P.topValues _),
    "q08_topk_patterns" -> (P.topPatterns _),
    "q17_window_top_orders" -> (A.topOrdersPerCustomer _),
    "q18_join_revenue_nation" -> (A.revenuePerNation _),
    "q19_events_hourly" -> (A.eventsHourly _),
    "q20_quartiles_outliers" -> (A.quartilesOutliers _),
    "q21_distinct_counts" -> (A.distinctCounts _),
    "q22_approx_distinct" -> (A.approxDistinct _),
    "q23_histogram" -> (A.histogram _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> A.pricingSummarySql,
    "q02_profile_numeric" -> P.profileNumericSql,
    "q03_profile_orders" -> P.profileOrdersSql,
    "q04_complete_records" -> P.completeRecordsSql,
    "q05_length_stats" -> P.lengthStatsSql,
    "q06_type_census" -> P.typeCensusSql,
    "q07_topk_values" -> P.topValuesSql,
    "q08_topk_patterns" -> P.topPatternsSql,
    "q17_window_top_orders" -> A.topOrdersPerCustomerSql,
    "q18_join_revenue_nation" -> A.revenuePerNationSql,
    "q19_events_hourly" -> A.eventsHourlySql,
    "q20_quartiles_outliers" -> A.quartilesOutliersSql,
    "q21_distinct_counts" -> A.distinctCountsSql,
    "q23_histogram" -> A.histogramSql)
}
