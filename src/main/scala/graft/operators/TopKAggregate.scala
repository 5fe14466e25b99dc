package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import graft.streaming.StreamingTopK

/** Batch top-K frequent values with BOUNDED state — the Space-Saving
  * sketch (Metwally/Agrawal/El Abbadi, ICDT'05) as a Spark
  * `Aggregator`, the batch twin of [[graft.streaming.StreamingTopK]]
  * (same update step, shared code). This completes the mergeable-
  * summary family the engine leans on at 100 TB — moments (Pébay),
  * distinct (HLL), quantiles (GK), and now heavy hitters — every one
  * an associative-commutative accumulator whose partial states, not
  * rows, cross the shuffle.
  *
  * vs the exact top-K (q07's groupBy.count + TakeOrderedAndProject):
  * exact top-K's intermediate is one row PER DISTINCT VALUE — fine for
  * profiling columns, quadratic pain for web-scale value domains.
  * Here every partial buffer holds ≤ `capacity` entries regardless of
  * the domain, with the classic guarantees: any value with true
  * frequency > N/capacity is present, and every reported count lies in
  * [true, true + err]. With `capacity` above the distinct-value count
  * the sketch IS exact (all errors 0) — the regime the q67 gate runs
  * in, making it DuckDB-oracle-checkable; the overflow regime's bounds
  * are property-tested in TopKAggregateSpec.
  *
  * The merge (Agarwal et al., PODS'12 "Mergeable summaries"): sum
  * counts and error bounds over the union, keep the `capacity`
  * largest. Deterministic ties everywhere: (count desc, value asc).
  */
object TopKAggregate {

  type Counters = StreamingTopK.Counters // value -> (count, error)

  final case class TopKEntry(value: String, cnt: Long, err: Long, rank: Int)

  def mergeSketches(a: Counters, b: Counters, capacity: Int): Counters = {
    // a value ABSENT from a FULL sketch may still have occurred up to
    // that sketch's minimum counter times (it could have been evicted,
    // or never admitted past the floor) — substituting 0 would break
    // the `reported >= true` overestimate invariant. Absent-side
    // contribution is therefore (min, min): count upper-bounded by the
    // floor, all of it potentially phantom. A sketch below capacity
    // never evicted, so absence there genuinely means zero.
    def floor(s: Counters): Long =
      if (s.size >= capacity) s.values.iterator.map(_._1).min else 0L
    val (fa, fb) = (floor(a), floor(b))
    val union = (a.keySet ++ b.keySet).iterator.map { v =>
      val (c1, e1) = a.getOrElse(v, (fa, fa))
      val (c2, e2) = b.getOrElse(v, (fb, fb))
      v -> (c1 + c2, e1 + e2)
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
      .take(capacity).toMap
  }

  /** Top-`k` entries of a finished sketch, rank 1-based, deterministic
    * (count desc, value asc) order. */
  def finishSketch(s: Counters, k: Int): Seq[TopKEntry] =
    s.toSeq.sortBy { case (v, (c, _)) => (-c, v) }.take(k).zipWithIndex
      .map { case ((v, (c, e)), i) => TopKEntry(v, c, e, i + 1) }

  /** The Aggregator — register with `functions.udaf(topKAgg(k, cap),
    * Encoders.STRING)` and use inside any groupBy. */
  def topKAgg(k: Int, capacity: Int): Aggregator[String, Counters, Seq[TopKEntry]] =
    new Aggregator[String, Counters, Seq[TopKEntry]] {
      def zero: Counters = Map.empty
      def reduce(s: Counters, v: String): Counters =
        StreamingTopK.updateSketch(s, v, 1L, capacity)
      def merge(a: Counters, b: Counters): Counters =
        mergeSketches(a, b, capacity)
      def finish(s: Counters): Seq[TopKEntry] = finishSketch(s, k)
      def bufferEncoder: Encoder[Counters] = Encoders.kryo[Counters]
      def outputEncoder: Encoder[Seq[TopKEntry]] =
        ExpressionEncoder[Seq[TopKEntry]]()
    }
}
