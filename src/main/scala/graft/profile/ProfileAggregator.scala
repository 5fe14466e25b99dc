package graft.profile

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-buffer moments profiler as a Spark `Aggregator` — the direct
  * analogue of the reference's combinable ReduceFunction over StatsPojo
  * (reference: jar/ProfileJob.java:103 + StatsPojo.java:101-155): one
  * accumulator carrying (n, mean, M2, M3, M4, min, max), pairwise
  * Pébay merge, associative + commutative (scalacheck-verified), hence
  * safe for partial aggregation AND for Structured Streaming state
  * (merge order under retriggering is unspecified — commutativity is
  * the load-bearing property).
  *
  * Built-in `var_pop`/`skewness`/`kurtosis` cover the batch path
  * ([[NumericProfiler]]); this Aggregator exists for (a) exact
  * single-pass parity with the reference's one-accumulator design,
  * (b) streaming windowed profiles ([[graft.streaming.StreamingProfile]]),
  * (c) one-shot M2/M3/M4 without algebraic reconstruction.
  */
object MomentsAggregator extends Aggregator[java.lang.Double, Moments, MomentsResult] {

  override def zero: Moments = Moments.zero

  override def reduce(b: Moments, a: java.lang.Double): Moments =
    if (a == null) b else b.add(a.doubleValue())

  override def merge(b1: Moments, b2: Moments): Moments = b1.merge(b2)

  override def finish(m: Moments): MomentsResult =
    MomentsResult(m.n, m.mean, m.m2, m.m3, m.m4, m.min, m.max,
      DerivedStats.variancePop(m), DerivedStats.stddevPop(m),
      DerivedStats.skewnessPop(m), DerivedStats.kurtosisPop(m))

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[MomentsResult] = Encoders.product[MomentsResult]

  /** Column form: `df.agg(MomentsAggregator.toColumn(col("x")))`. */
  def asColumn(c: Column): Column = udaf(this).apply(c)
}

/** Flattened aggregator output (struct column in the result). */
final case class MomentsResult(
    n: Long, mean: Double, m2: Double, m3: Double, m4: Double,
    min: Double, max: Double,
    var_pop: Double, stddev_pop: Double, skew_pop: Double, kurt_pop: Double)
