package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT interpolated quantiles with bounded per-task (and driver)
  * memory — the scale-true replacement for `percentile`, whose
  * aggregation buffer holds EVERY value of the column (the documented
  * weakness of q20; AnalyticsQueries.quartilesOutliers).
  *
  * Two-phase histogram refinement (the classic distributed selection
  * algorithm — iterative range narrowing, e.g. Blum et al.-style rank
  * selection adapted to scans):
  *
  *  1. one scan → (count, min, max);
  *  2. refinement scans: bucket the ACTIVE value ranges into `buckets`
  *     equal-width bins — one `groupBy(range, bucket)` per scan for ALL
  *     unresolved quantile ranks at once (≤ 2·#quantiles tiny ranges) —
  *     and descend into the bin containing each target rank. Each pass
  *     divides the candidate count by `buckets`; a bin whose min equals
  *     its max resolves immediately (handles massive duplicates and
  *     guarantees termination at double precision);
  *  3. final scan: collect the surviving candidate sets — each at most
  *     `collectMax` values — and index the exact rank.
  *
  * State: `buckets` counters per range per task (KBs), `collectMax`
  * doubles on the driver at the end. Passes: 1 + ceil(log_buckets(n /
  * collectMax)) + 1 — at 10^12 rows with the defaults that is 4 scans
  * total, each narrower than the last (the refinement filters push
  * down to parquet row-group stats). Interpolation follows
  * `percentile` / DuckDB `quantile_cont`: rank h = 1 + p·(n−1),
  * result = v_⌊h⌋ + (h−⌊h⌋)·(v_⌈h⌉ − v_⌊h⌋) over 1-based order
  * statistics. Nulls are ignored (as `percentile` does); NaNs are the
  * caller's responsibility (no total order).
  */
object ExactQuantile {

  /** Per-call diagnostics, exposed so the memory-bound CLAIM is
    * spec-testable rather than asserted in prose. */
  final case class Stats(scans: Int, maxCollected: Int)

  def quantiles(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): Seq[Double] =
    quantilesWithStats(df, valueCol, ps, buckets, collectMax)._1

  def quantilesWithStats(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): (Seq[Double], Stats) = {
    require(ps.forall(p => p >= 0 && p <= 1), s"percentiles out of [0,1]: $ps")
    val v = col(valueCol).cast("double")
    val vals = df.filter(v.isNotNull).select(v.as("v"))
    val head = vals.agg(
      count(col("v")).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx")
    ).head()
    val n = head.getLong(0)
    if (n == 0) return (ps.map(_ => Double.NaN), Stats(1, 0))
    val (mn, mx) = (head.getDouble(1), head.getDouble(2))
    var scans = 1
    var maxCollected = 0

    // 1-based continuous ranks; each quantile needs order statistics
    // floor(h) and ceil(h)
    val hs = ps.map(p => 1.0 + p * (n - 1).toDouble)
    val neededRanks: Seq[Long] =
      hs.flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong))
        .distinct.sorted

    // state per unresolved rank: candidate range [lo, hi] (inclusive,
    // exact — bin min/max), rank offset within it, candidate count
    final case class Target(rank: Long, lo: Double, hi: Double,
        offset: Long, cnt: Long)
    var active = neededRanks.map(r => Target(r, mn, mx, r, n)).toBuffer
    val resolved = scala.collection.mutable.Map[Long, Double]()

    // immediate resolutions: degenerate range
    def settle(): Unit = {
      val (done, rest) = active.partition(t => t.lo == t.hi)
      done.foreach(t => resolved(t.rank) = t.lo)
      active = rest
    }
    settle()

    while (active.exists(_.cnt > collectMax)) {
      val ranges = active.map(t => (t.lo, t.hi)).distinct
      // rangeIdx: first matching range (ranges may share boundary
      // values; counts stay exact because targets read only their own
      // range's bins and bins partition VALUES, see below)
      val rangeIdx = ranges.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, ((lo, hi), i)) =>
          when(col("v") >= lo && col("v") <= hi && acc === -1, i).otherwise(acc)
      }
      val widths = ranges.map { case (lo, hi) =>
        math.max((hi - lo) / buckets, java.lang.Double.MIN_VALUE) }
      val bucketExpr = ranges.indices.foldLeft(lit(-1L): Column) {
        case (acc, i) =>
          when(col("rix") === i,
            least(floor((col("v") - ranges(i)._1) / widths(i)).cast("long"),
              lit(buckets - 1L))).otherwise(acc)
      }
      val bins = vals.select(col("v"), rangeIdx.as("rix"))
        .filter(col("rix") >= 0)
        .select(col("v"), col("rix"), bucketExpr.as("b"))
        .groupBy("rix", "b")
        .agg(count(col("v")).as("c"), min(col("v")).as("bmn"),
          max(col("v")).as("bmx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      scans += 1
      active = active.map { t =>
        val rix = ranges.indexOf((t.lo, t.hi))
        var cum = 0L
        var out = t
        var b = 0L
        var found = false
        while (!found && b < buckets) {
          bins.get((rix, b)) match {
            case Some((c, bmn, bmx)) =>
              if (t.offset <= cum + c) {
                out = Target(t.rank, bmn, bmx, t.offset - cum, c)
                found = true
              }
              cum += c
            case None => ()
          }
          b += 1
        }
        assert(found, s"rank ${t.rank} not found in refinement bins")
        out
      }
      // stall guard: a range a few ulps wide (massive duplicates over
      // a handful of representable doubles) can land entirely in one
      // bin — equal-width splitting makes no progress there. Such a
      // range has fewer distinct VALUES than bins, so resolve it with
      // one bounded distinct-value histogram instead.
      val (stalled, progressing) = active.partition(t =>
        t.lo < t.hi && (t.hi - t.lo) / buckets == 0 && t.cnt > collectMax)
      if (stalled.nonEmpty) {
        stalled.groupBy(t => (t.lo, t.hi)).foreach { case ((lo, hi), ts) =>
          val hist = vals.filter(col("v") >= lo && col("v") <= hi)
            .groupBy("v").agg(count(col("v")).as("c"))
            .orderBy("v").collect()
            .map(r => (r.getDouble(0), r.getLong(1)))
          scans += 1
          ts.foreach { t =>
            var cum = 0L
            val it = hist.iterator
            var done = false
            while (!done && it.hasNext) {
              val (value, c) = it.next()
              if (t.offset <= cum + c) { resolved(t.rank) = value; done = true }
              cum += c
            }
            assert(done, s"rank ${t.rank} not found in value histogram")
          }
        }
        active = progressing
      }
      settle()
    }

    if (active.nonEmpty) {
      // final: collect each surviving candidate set (≤ collectMax each)
      // in ONE scan and index the exact within-range rank
      val ranges = active.map(t => (t.lo, t.hi)).distinct
      val rangeIdx = ranges.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, ((lo, hi), i)) =>
          when(col("v") >= lo && col("v") <= hi && acc === -1, i).otherwise(acc)
      }
      val byRange = vals.select(col("v"), rangeIdx.as("rix"))
        .filter(col("rix") >= 0)
        .collect().map(r => r.getInt(1) -> r.getDouble(0))
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).sorted }
      scans += 1
      active.foreach { t =>
        val xs = byRange(ranges.indexOf((t.lo, t.hi)))
        maxCollected = math.max(maxCollected, xs.length)
        assert(xs.length == t.cnt,
          s"candidate count drifted: ${xs.length} vs ${t.cnt}")
        resolved(t.rank) = xs((t.offset - 1).toInt)
      }
    }

    val out = hs.map { h =>
      val (rlo, rhi) = (math.floor(h).toLong, math.ceil(h).toLong)
      val (vlo, vhi) = (resolved(rlo), resolved(rhi))
      vlo + (h - rlo) * (vhi - vlo)
    }
    (out, Stats(scans, maxCollected))
  }
}
