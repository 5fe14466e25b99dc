package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch as a Spark `Aggregator` —
  * the streaming/mergeable twin of q326's batch KMV: the buffer is
  * the sorted set of the ≤ k smallest DISTINCT hash values seen, so
  * state is k longs per group regardless of the domain, and the merge
  * (union, dedupe, truncate to k) is exactly the bottom-k lattice
  * join — associative, commutative, idempotent. That last property is
  * stronger than most of the mergeable family has (re-merging the
  * same partial changes nothing), and it makes the sketch's ESTIMATE
  * deterministic: any partitioning, batching, or replay of the same
  * input yields the bit-identical bottom-k set, so unlike HLL (q59's
  * bound-gate) the streamed estimate itself can ride a cross-engine
  * hash gate.
  *
  * Estimator (Bar-Yossef et al. 2002): with h uniform on [0, 2³²),
  * `(k−1)·2³² div h_k`; below k distinct hashes the set IS the
  * distinct census. All integer.
  */
object KmvSketch {

  /** Insert `h` into the sorted bottom-`k` distinct buffer. */
  def insert(buf: Vector[Long], h: Long, k: Int): Vector[Long] = {
    if (buf.length >= k && h >= buf.last) buf
    else {
      val i = buf.search(h) match {
        case scala.collection.Searching.Found(_) => return buf
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      val grown = (buf.take(i) :+ h) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  /** Bottom-k lattice join: union, dedupe, keep the k smallest. */
  def mergeBottomK(a: Seq[Long], b: Seq[Long], k: Int): Vector[Long] =
    (a ++ b).distinct.sorted.take(k).toVector

  /** `(estimate, exactRegime)` from a finished bottom-k set. */
  def estimate(sorted: Seq[Long], k: Int): (Long, Boolean) =
    if (sorted.length >= k) (((k - 1).toLong * 4294967296L) / sorted(k - 1), false)
    else (sorted.length.toLong, true)

  /** The Aggregator — `functions.udaf(bottomKAgg(k), Encoders.scalaLong)`,
    * usable in any batch groupBy or streaming window aggregate. */
  def bottomKAgg(k: Int): Aggregator[Long, Vector[Long], Seq[Long]] =
    new Aggregator[Long, Vector[Long], Seq[Long]] {
      def zero: Vector[Long] = Vector.empty
      def reduce(buf: Vector[Long], h: Long): Vector[Long] = insert(buf, h, k)
      def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
        mergeBottomK(a, b, k)
      def finish(buf: Vector[Long]): Seq[Long] = buf
      def bufferEncoder: Encoder[Vector[Long]] = Encoders.kryo[Vector[Long]]
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}
