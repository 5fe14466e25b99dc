package graft.profile

/** Final per-column profile — the Spark-native analogue of the reference's
  * result accumulator (org/apache/flink/stats/StatsPojo.java:13-56), with
  * derived statistics computed on demand from the base moments via
  * [[DerivedStats]] (mirroring StatsPojo's derived-stat methods
  * :173-287).
  */
final case class Census(
    booleanValues: Long,
    intValues: Long,
    longValues: Long,
    floatValues: Long,
    doubleValues: Long,
    dateValues: Long)

final case class ColumnProfile(
    name: String,
    dataType: String,
    rowCount: Long,
    nullValues: Long,
    emptyStrings: Long,
    /** moments over double-cast numeric values; `moments.n` is the
      * reference's `numericValues` (Date/Timestamp count as epoch-millis
      * numerics, CastUtils.java:60-62). */
    moments: Moments,
    minLength: Option[Long],
    maxLength: Option[Long],
    avgLength: Option[Double],
    census: Option[Census],
    topValues: Seq[(String, Long)] = Nil,
    topPatterns: Seq[(String, Long)] = Nil) {

  def nonNullValues: Long = rowCount - nullValues
  def numericValues: Long = moments.n

  /** Render the column report (reference: StatsPojo.toString,
    * StatsPojo.java:442-504 — with the numeric-values print bug at :449
    * fixed: the reference prints nullValues twice). */
  def report(topK: Int = 20): String = {
    val m = moments
    val sb = new StringBuilder
    def line(k: String, v: Any): Unit = sb.append(s"  $k: $v\n")
    sb.append(s"Column '$name' ($dataType)\n")
    line("Row count", rowCount)
    line("Null values", nullValues)
    line("Numeric values", numericValues) // reference bug #1 fixed here
    line("Empty strings", emptyStrings)
    line("Min", m.min); line("Max", m.max); line("Mean", m.mean)
    line("Population variance", DerivedStats.variancePop(m))
    line("Sample variance", DerivedStats.varianceSamp(m))
    line("Sample variance std error", DerivedStats.varianceSampStdError(m))
    line("Population std dev", DerivedStats.stddevPop(m))
    line("Sample std dev", DerivedStats.stddevSamp(m))
    line("Sample std dev std error", DerivedStats.stddevSampStdError(m))
    line("Mean square error", DerivedStats.meanSquareError(m))
    line("Population skewness", DerivedStats.skewnessPop(m))
    line("Sample skewness", DerivedStats.skewnessSamp(m))
    line("Sample skewness std error", DerivedStats.skewnessSampStdError(m))
    line("Population kurtosis", DerivedStats.kurtosisPop(m))
    line("Sample kurtosis", DerivedStats.kurtosisSamp(m))
    line("Sample kurtosis std error", DerivedStats.kurtosisSampStdError(m))
    val exc = DerivedStats.excessKurtosisSamp(m)
    line("Excess kurtosis (sample)",
      s"$exc (${DerivedStats.kurtosisInterpretation(exc)})")
    val jb = DerivedStats.jarqueBera(m)
    line("Jarque-Bera score", jb)
    DerivedStats.jarqueBeraTable(jb).foreach { case (alpha, rejected) =>
      line(s"JB normality H0 @ $alpha",
        if (rejected) "REJECTED" else "NOT REJECTED")
    }
    (minLength, maxLength, avgLength) match {
      case (Some(mn), Some(mx), Some(av)) =>
        line("Min length", mn); line("Max length", mx); line("Avg length", av)
      case _ => ()
    }
    census.foreach { cs =>
      line("Boolean values", cs.booleanValues)
      line("Int values", cs.intValues)
      line("Long values", cs.longValues)
      line("Float values", cs.floatValues)
      line("Double values", cs.doubleValues)
      line("Date values", cs.dateValues)
    }
    if (topValues.nonEmpty)
      line(s"Top-$topK values", topValues.map { case (v, c) => s"$v=$c" }.mkString(", "))
    if (topPatterns.nonEmpty)
      line(s"Top-$topK patterns", topPatterns.map { case (v, c) => s"$v=$c" }.mkString(", "))
    sb.toString
  }
}

final case class TableProfile(
    rowCount: Long,
    completeRecords: Long,
    columns: Seq[ColumnProfile]) {
  def report(topK: Int = 20): String =
    s"Rows: $rowCount\nComplete records: $completeRecords\n" +
      columns.map(_.report(topK)).mkString("\n")
}
