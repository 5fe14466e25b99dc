package graft.profile

/** Closed-form derived statistics from base moments `(n, mean, m2, m3, m4,
  * min, max)` — driver-side pure math, no Spark dependency.
  *
  * Formula provenance (reference: org/apache/flink/stats/StatsPojo.java):
  *  - population/sample variance                      :173-179
  *  - sample-variance std error `s^2*sqrt(2/(n-1))`   :181-183
  *  - population/sample stddev                        :185-191
  *  - sample-stddev std error `s/sqrt(2(n-1))`        :193-195
  *  - mean square error (std error of mean) `s/sqrt(n)` :205-207
  *  - population skewness `M3*sqrt(n)/M2^1.5`         :214-219
  *  - sample skewness `pop*n/(n-1)` (McCrary factor — nonstandard,
  *    deliberately preserved)                         :226-231
  *  - sample skewness std error                       :233-236
  *  - population kurtosis `n*M4/M2^2`                 :243-248
  *  - sample kurtosis `pop*n/(n-1)`                   :255-260
  *  - sample kurtosis std error `2*SES*sqrt((n^2-1)/((n-3)(n+5)))` :262-265
  *  - excess kurtosis = kurtosis - 3                  :267-273
  *  - Jarque-Bera `(n/6)*(S^2 + K^2/4)` with SAMPLE skew and SAMPLE
  *    excess kurtosis; NaN when n=0                   :280-287
  *  - JB chi^2(df=2) critical values                  :529-545
  *  - kurtosis interpretation strings                 :506-523
  *  - Scott's-rule histogram bin width with skew correction
  *    (reference: jar/ProfileJob.java:146-162)
  */
object DerivedStats {

  // ---- variance family -----------------------------------------------

  def variancePop(m: Moments): Double =
    if (m.n == 0L) Double.NaN else m.m2 / m.n

  def varianceSamp(m: Moments): Double =
    if (m.n <= 1L) Double.NaN else m.m2 / (m.n - 1)

  /** std error of the sample variance: s^2 * sqrt(2/(n-1)). */
  def varianceSampStdError(m: Moments): Double =
    varianceSamp(m) * math.sqrt(2.0 / (m.n - 1))

  def stddevPop(m: Moments): Double = math.sqrt(variancePop(m))
  def stddevSamp(m: Moments): Double = math.sqrt(varianceSamp(m))

  /** std error of the sample stddev: s / sqrt(2(n-1)). */
  def stddevSampStdError(m: Moments): Double =
    stddevSamp(m) / math.sqrt(2.0 * (m.n - 1))

  /** std error of the mean: s / sqrt(n). */
  def meanSquareError(m: Moments): Double =
    stddevSamp(m) / math.sqrt(m.n.toDouble)

  // ---- skewness family -----------------------------------------------

  /** Population skewness g1 = sqrt(n)*M3 / M2^1.5; 0 when M2 == 0. */
  def skewnessPop(m: Moments): Double =
    if (m.m2 == 0.0) 0.0
    else m.m3 * math.sqrt(m.n.toDouble) / math.pow(m.m2, 1.5)

  /** Sample skewness = pop * n/(n-1); 0 when n <= 1 (reference's
    * McCrary-style factor, NOT the usual sqrt(n(n-1))/(n-2)). */
  def skewnessSamp(m: Moments): Double =
    if (m.n <= 1L) 0.0 else skewnessPop(m) * m.n / (m.n - 1.0)

  /** SES = sqrt(6n(n-1) / ((n-2)(n+1)(n+3))). */
  def skewnessSampStdError(m: Moments): Double = {
    val n = m.n.toDouble
    math.sqrt(6.0 * n * (n - 1) / ((n - 2) * (n + 1) * (n + 3)))
  }

  // ---- kurtosis family -----------------------------------------------

  /** Population kurtosis (NOT excess) = n*M4 / M2^2; 0 when M2 == 0. */
  def kurtosisPop(m: Moments): Double =
    if (m.m2 == 0.0) 0.0 else m.n * m.m4 / (m.m2 * m.m2)

  /** Sample kurtosis = pop * n/(n-1); 0 when n <= 1. */
  def kurtosisSamp(m: Moments): Double =
    if (m.n <= 1L) 0.0 else kurtosisPop(m) * m.n / (m.n - 1.0)

  /** SEK = 2*SES*sqrt((n^2-1) / ((n-3)(n+5))). */
  def kurtosisSampStdError(m: Moments): Double = {
    val n = m.n.toDouble
    2.0 * skewnessSampStdError(m) * math.sqrt((n * n - 1) / ((n - 3) * (n + 5)))
  }

  def excessKurtosisPop(m: Moments): Double = kurtosisPop(m) - 3.0
  def excessKurtosisSamp(m: Moments): Double = kurtosisSamp(m) - 3.0

  /** Interpretation string (reference: StatsPojo.java:506-523). */
  def kurtosisInterpretation(excess: Double): String =
    if (excess.isNaN) "undefined"
    else if (excess == 0.0) "mesokurtic"
    else if (excess > 0.0) "leptokurtic"
    else "platykurtic"

  // ---- Jarque-Bera ---------------------------------------------------

  /** JB = (n/6) * (S^2 + K^2/4), S = SAMPLE skewness, K = SAMPLE excess
    * kurtosis; NaN when n == 0. */
  def jarqueBera(m: Moments): Double =
    if (m.n == 0L) Double.NaN
    else {
      val s = skewnessSamp(m)
      val k = excessKurtosisSamp(m)
      m.n / 6.0 * (s * s + k * k / 4.0)
    }

  /** chi^2(df=2) critical values for alpha = 10%, 5%, 2.5%, 1%
    * (reference: StatsPojo.java:529-545). */
  val jbCriticalValues: Seq[(String, Double)] =
    Seq("10%" -> 4.61, "5%" -> 5.99, "2.5%" -> 7.38, "1%" -> 9.21)

  /** H0 (normality) REJECTED iff score > threshold, per alpha level. */
  def jarqueBeraTable(score: Double): Seq[(String, Boolean)] =
    jbCriticalValues.map { case (alpha, crit) => (alpha, score > crit) }

  // ---- histogram bin width (Scott's rule) ----------------------------

  /** Scott's rule `floor(3.49 * sigma_pop * rowCount^(-1/3))` with the
    * reference's skew correction applied AFTER the floor: x0.4 / x0.6 /
    * x0.7 when ceil(populationSkewness) = 1 / 2 / 3; for skew > 3 the
    * estimate is flagged unreliable but the uncorrected width is still
    * returned (exact reference behavior, jar/ProfileJob.java:146-162).
    *
    * @param rowCount the reference uses the full row count, not the
    *                 numeric-value count (jar/ProfileJob.java:148)
    * @return (binWidth, reliable)
    */
  def scottBinWidth(m: Moments, rowCount: Long): (Double, Boolean) = {
    val base = math.floor(
      3.49 * stddevPop(m) * math.pow(rowCount.toDouble, -1.0 / 3.0))
    val skew = math.ceil(skewnessPop(m))
    if (skew == 1.0) (base * 0.4, true)
    else if (skew == 2.0) (base * 0.6, true)
    else if (skew == 3.0) (base * 0.7, true)
    else if (skew > 3.0) (base, false)
    else (base, true)
  }
}
