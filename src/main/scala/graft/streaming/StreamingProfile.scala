package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.profile.MomentsAggregator

/** Structured Streaming windowed profiling — the unbounded variant of
  * the profile surface (the reference is batch-only; its merge algebra
  * is what makes this work: the Pébay accumulator is associative +
  * commutative, so Spark can maintain it incrementally as streaming
  * state under arbitrary trigger boundaries and late-data merges).
  *
  * Shapes supported:
  *  - [[windowedStats]]: event-time tumbling-window stats per key with
  *    a watermark bounding state;
  *  - [[windowedMoments]]: same windows, full single-buffer moments via
  *    [[MomentsAggregator]] (variance/skew/kurtosis on a stream).
  *
  * At scale: state is hash-partitioned by (window, key); each micro-
  * batch shuffles only partial aggregates; the watermark expires state
  * so memory is bounded by (#keys × watermark horizon / window).
  */
object StreamingProfile {

  /** Tumbling-window basic stats over a streaming frame. `events` must
    * have an event-time column `tsCol` (TimestampType), a key column and
    * a numeric value column. */
  def windowedStats(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowLen: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col(valueCol)).as("avg_value"),
        // exact cent sum alongside the float mean: money-valued columns
        // have terminating decimal means that land on rounding edges,
        // so cross-engine gates derive their mean from this instead
        sum(floor(col(valueCol) * lit(100d)).cast("long")).as("sum_cents"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        stddev_pop(col(valueCol)).as("stddev_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("avg_value"), col("sum_cents"),
        col("min_value"), col("max_value"), col("stddev_value"))

  /** Full moments (M2/M3/M4 → var/skew/kurt) per window and key via the
    * single-buffer [[MomentsAggregator]]. */
  def windowedMoments(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowLen: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(MomentsAggregator.asColumn(col(valueCol).cast("double")).as("m"),
        // exact integer moments beside the float state — gate means and
        // variances derive from them (money-valued moments land on
        // rounding edges; see windowedStats / QueryUtil.centMean6)
        sum(floor(col(valueCol) * lit(100d)).cast("long")).as("sum_cents"),
        sum((floor(col(valueCol) * lit(100d)).cast("long") *
          floor(col(valueCol) * lit(100d)).cast("long"))).as("sum_cents2"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("m.n").as("n"), col("m.mean").as("mean"),
        col("sum_cents"), col("sum_cents2"),
        col("m.var_pop").as("var_pop"), col("m.skew_pop").as("skew_pop"),
        col("m.kurt_pop").as("kurt_pop"),
        col("m.min").as("min"), col("m.max").as("max"))
}
