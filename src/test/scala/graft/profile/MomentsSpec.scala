package graft.profile

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Pébay pairwise moment merge — the algebra the
  * whole profiling surface (batch aggregate, streaming state) rests on.
  * Mirrors the reference's accumulator merge
  * (org/apache/flink/stats/StatsPojo.java:101-155). Deterministic
  * seeded-random vectors stand in for scalacheck (not in the offline
  * dependency cache). */
class MomentsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def vec(n: Int): Seq[Double] =
    Seq.fill(n)(rnd.nextDouble() * 2000 - 1000)
  private val cases: Seq[Seq[Double]] =
    Seq(Seq.empty[Double], Seq(3.14), Seq(1.0, 1.0), vec(2), vec(3)) ++
      (1 to 40).map(i => vec(rnd.nextInt(50) + 1))

  private def naive(xs: Seq[Double]): Moments = {
    val n = xs.size
    if (n == 0) Moments.zero
    else {
      val mean = xs.sum / n
      def mom(p: Int) = xs.map(x => math.pow(x - mean, p)).sum
      Moments(n.toLong, mean, mom(2), mom(3), mom(4), xs.min, xs.max)
    }
  }

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * (1 + math.abs(a) + math.abs(b))

  private def assertClose(a: Moments, b: Moments): Unit = {
    assert(a.n == b.n)
    assert(close(a.mean, b.mean), s"mean ${a.mean} vs ${b.mean}")
    assert(close(a.m2, b.m2), s"m2 ${a.m2} vs ${b.m2}")
    assert(close(a.m3, b.m3), s"m3 ${a.m3} vs ${b.m3}")
    assert(close(a.m4, b.m4), s"m4 ${a.m4} vs ${b.m4}")
    assert(close(a.min, b.min) && close(a.max, b.max))
  }

  test("single-pass fold matches the naive two-pass formulas") {
    cases.foreach(xs => assertClose(Moments.of(xs), naive(xs)))
  }

  test("merge is commutative") {
    for (a <- cases.take(15); b <- cases.take(15))
      assertClose(Moments.of(a).merge(Moments.of(b)),
        Moments.of(b).merge(Moments.of(a)))
  }

  test("merge is associative") {
    for (Seq(a, b, c) <- cases.take(12).combinations(3).take(100)) {
      val l = Moments.of(a).merge(Moments.of(b)).merge(Moments.of(c))
      val r = Moments.of(a).merge(Moments.of(b).merge(Moments.of(c)))
      assertClose(l, r)
    }
  }

  test("partition invariance: fold == merge of arbitrary chunks") {
    cases.foreach { xs =>
      for (k <- Seq(1, 2, 3, 7)) {
        val merged = xs.grouped(k).toSeq.map(Moments.of)
          .foldLeft(Moments.zero)(_.merge(_))
        assertClose(merged, Moments.of(xs))
      }
    }
  }

  test("zero is the identity") {
    cases.foreach { xs =>
      val m = Moments.of(xs)
      assertClose(m.merge(Moments.zero), m)
      assertClose(Moments.zero.merge(m), m)
    }
  }

  test("reference edge cases (StatsPojo semantics)") {
    // n=0: min/max NaN (StatsPojo.java:27-29)
    assert(Moments.zero.min.isNaN && Moments.zero.max.isNaN)
    // constant column: M2=0 => skew/kurt 0 (StatsPojo.java:215-217,244-246)
    val const = Moments.of(Seq(5.0, 5.0, 5.0))
    assert(DerivedStats.skewnessPop(const) == 0.0)
    assert(DerivedStats.kurtosisPop(const) == 0.0)
    // n<=1: sample variants 0 (StatsPojo.java:227-229,256-258)
    val one = Moments.of(Seq(1.0))
    assert(DerivedStats.skewnessSamp(one) == 0.0)
    assert(DerivedStats.kurtosisSamp(one) == 0.0)
    // n=0: Jarque-Bera NaN (StatsPojo.java:281-283)
    assert(DerivedStats.jarqueBera(Moments.zero).isNaN)
  }

  test("derived stats closed-form on a hand-computed vector") {
    // xs = 1,2,3,4 : mean 2.5, M2 = 5, var_pop 1.25, var_samp 5/3
    val m = Moments.of(Seq(1.0, 2.0, 3.0, 4.0))
    assert(m.n == 4 && m.mean == 2.5)
    assert(math.abs(m.m2 - 5.0) < 1e-12)
    assert(math.abs(DerivedStats.variancePop(m) - 1.25) < 1e-12)
    assert(math.abs(DerivedStats.varianceSamp(m) - 5.0 / 3.0) < 1e-12)
    assert(DerivedStats.skewnessPop(m).abs < 1e-12) // symmetric
    // kurtosis_pop = n*M4/M2^2 ; M4 = 2*(1.5^4 + 0.5^4) = 10.25
    assert(math.abs(DerivedStats.kurtosisPop(m) - 4 * 10.25 / 25.0) < 1e-12)
    // sample skew factor is the reference's n/(n-1) (StatsPojo.java:230)
    assert(close(DerivedStats.skewnessSamp(m),
      DerivedStats.skewnessPop(m) * 4.0 / 3.0))
  }
}
