package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k lattice properties — what makes the q331 streamed
  * estimate deterministic under any batching: merge is associative,
  * commutative, idempotent, and partition-invariant (fold of any
  * chunking == global bottom-k). Seeded-random vectors stand in for
  * scalacheck (not in the offline cache — the MomentsSpec pattern). */
class KmvSketchSpec extends AnyFunSuite {

  private val K = 8
  private def global(xs: Seq[Long]): Vector[Long] =
    xs.distinct.sorted.take(K).toVector
  private def fold(xs: Seq[Long]): Vector[Long] =
    xs.foldLeft(Vector.empty[Long])((b, h) => KmvSketch.insert(b, h, K))

  private val rnd = new scala.util.Random(42)
  private def sample(): Seq[Long] =
    Seq.fill(rnd.nextInt(60))(rnd.nextLong(1000L))

  test("insert fold == global distinct-sort-truncate") {
    (1 to 200).foreach { _ =>
      val xs = sample()
      assert(fold(xs) == global(xs))
    }
  }

  test("merge is commutative, associative, idempotent") {
    (1 to 100).foreach { _ =>
      val (a, b, c) = (fold(sample()), fold(sample()), fold(sample()))
      def m(x: Seq[Long], y: Seq[Long]) = KmvSketch.mergeBottomK(x, y, K)
      assert(m(a, b) == m(b, a))
      assert(m(m(a, b), c) == m(a, m(b, c)))
      assert(m(a, a) == a)
    }
  }

  test("partition invariance: merge of arbitrary chunks == global") {
    (1 to 100).foreach { _ =>
      val xs = sample()
      val nChunks = 1 + rnd.nextInt(5)
      val chunks =
        if (xs.isEmpty) Seq(Seq.empty[Long])
        else xs.grouped(math.max(1, xs.length / nChunks)).toSeq
      val merged = chunks.map(fold)
        .reduce((a, b) => KmvSketch.mergeBottomK(a, b, K))
      assert(merged == global(xs))
    }
  }

  test("estimate: exact below k, formula at k, deterministic") {
    assert(KmvSketch.estimate(Vector(5L, 9L), K) == ((2L, true)))
    val full = Vector.tabulate(K)(i => (i + 1L) * 1000L)
    val (est, exact) = KmvSketch.estimate(full, K)
    assert(!exact && est == ((K - 1).toLong * 4294967296L) / (K * 1000L))
  }
}
