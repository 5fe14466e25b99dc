package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT interpolated quantiles with bounded per-task (and driver)
  * memory — the scale-true replacement for `percentile`, whose
  * aggregation buffer holds EVERY value of its column/group (the
  * documented weakness of q20/q50).
  *
  * Iterative histogram refinement (the classic distributed selection
  * algorithm — range narrowing by counting):
  *
  *  1. one scan → per-group (count, min, max);
  *  2. refinement scans: bucket the ACTIVE value ranges into `buckets`
  *     equal-width bins — one `groupBy(range, bucket)` per scan for ALL
  *     unresolved (group, rank) targets at once — and descend into the
  *     bin containing each target rank. Each pass divides the
  *     candidate count by `buckets`; a bin whose min equals its max
  *     resolves immediately (handles massive duplicates and guarantees
  *     termination at double precision), and a range too narrow for
  *     equal-width splitting (width underflow) resolves through a
  *     bounded distinct-value histogram;
  *  3. final scan: collect the surviving candidate sets — each at most
  *     `collectMax` values — and index the exact rank.
  *
  * State: `buckets` counters per active range per task (KBs),
  * `collectMax` doubles on the driver at the end. Passes: 1 +
  * ceil(log_buckets(n / collectMax)) + 1 — at 10^12 rows with the
  * defaults that is 4 scans, each narrower than the last (refinement
  * filters push down to parquet row-group stats). Interpolation
  * follows `percentile` / DuckDB `quantile_cont`: rank h = 1 + p·(n−1),
  * result = v_⌊h⌋ + (h−⌊h⌋)·(v_⌈h⌉ − v_⌊h⌋) over 1-based order
  * statistics. Nulls are ignored (as `percentile` does); NaNs are the
  * caller's responsibility (no total order).
  *
  * The GROUPED form targets LOW-CARDINALITY strata (the q50 shape:
  * priorities, languages, sources): the refinement predicate chains
  * one branch per active (group, range), so group counts in the
  * hundreds are fine, web-scale group cardinalities are not — use
  * `approx_percentile` there.
  */
object ExactQuantile {

  /** Per-call diagnostics, exposed so the memory-bound CLAIM is
    * spec-testable rather than asserted in prose. */
  final case class Stats(scans: Int, maxCollected: Int)

  def quantiles(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): Seq[Double] =
    quantilesWithStats(df, valueCol, ps, buckets, collectMax)._1

  /** Ungrouped = grouped over a constant key. */
  def quantilesWithStats(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): (Seq[Double], Stats) = {
    val (byGroup, stats) = groupedQuantilesWithStats(
      df.withColumn("__g", lit(0)), "__g", valueCol, ps, buckets, collectMax)
    (byGroup.getOrElse(0, ps.map(_ => Double.NaN)), stats)
  }

  def groupedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): Map[Any, Seq[Double]] =
    groupedQuantilesWithStats(df, groupCol, valueCol, ps, buckets, collectMax)._1

  /** Exact quantiles per group-key value. Group keys must be usable as
    * Spark literals (string/numeric/date — the refinement predicates
    * embed them). Returns an empty map for an empty input. */
  def groupedQuantilesWithStats(
      df: DataFrame, groupCol: String, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): (Map[Any, Seq[Double]], Stats) = {
    require(ps.forall(p => p >= 0 && p <= 1), s"percentiles out of [0,1]: $ps")
    val v = col(valueCol).cast("double")
    val vals = df.filter(v.isNotNull)
      .select(col(groupCol).as("g"), v.as("v"))
    val groupStats = vals.groupBy("g").agg(
      count(col("v")).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx")
    ).collect().map(r => (r.get(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    var scans = 1
    var maxCollected = 0
    if (groupStats.isEmpty) return (Map.empty, Stats(scans, 0))

    // per group: 1-based continuous ranks for floor(h)/ceil(h)
    val hsByGroup: Map[Any, Seq[Double]] = groupStats.map { case (g, n, _, _) =>
      g -> ps.map(p => 1.0 + p * (n - 1).toDouble)
    }.toMap

    final case class Target(g: Any, rank: Long, lo: Double, hi: Double,
        offset: Long, cnt: Long)
    var active = groupStats.flatMap { case (g, n, mn, mx) =>
      hsByGroup(g)
        .flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong))
        .distinct.map(r => Target(g, r, mn, mx, r, n))
    }.toBuffer
    val resolved = scala.collection.mutable.Map[(Any, Long), Double]()

    def settle(): Unit = {
      val (done, rest) = active.partition(t => t.lo == t.hi)
      done.foreach(t => resolved((t.g, t.rank)) = t.lo)
      active = rest
    }
    settle()

    // range index over (group, lo, hi) triples. The branches are
    // mutually exclusive BY CONSTRUCTION — same-group ranges are
    // disjoint (refinement bins are strictly value-ordered, dedup'd
    // when equal) and different groups never share rows — so no
    // first-match guard is needed. That also matters structurally: a
    // guard of the form `acc === -1` would reference the accumulated
    // expression twice per level and grow the tree 2^|ranges| (OOMs
    // the planner at ~40 ranges); this chain is linear.
    def rangeIdxExpr(ranges: Seq[(Any, Double, Double)]): Column =
      ranges.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, ((g, lo, hi), i)) =>
          when(col("g") === lit(g) && col("v") >= lo && col("v") <= hi, i)
            .otherwise(acc)
      }

    while (active.exists(_.cnt > collectMax)) {
      val ranges = active.map(t => (t.g, t.lo, t.hi)).distinct.toSeq
      val widths = ranges.map { case (_, lo, hi) =>
        math.max((hi - lo) / buckets, java.lang.Double.MIN_VALUE) }
      val bucketExpr = ranges.indices.foldLeft(lit(-1L): Column) {
        case (acc, i) =>
          when(col("rix") === i,
            least(floor((col("v") - ranges(i)._2) / widths(i)).cast("long"),
              lit(buckets - 1L))).otherwise(acc)
      }
      val bins = vals.select(col("g"), col("v"), rangeIdxExpr(ranges).as("rix"))
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
        val rix = ranges.indexOf((t.g, t.lo, t.hi))
        var cum = 0L
        var out = t
        var b = 0L
        var found = false
        while (!found && b < buckets) {
          bins.get((rix, b)) match {
            case Some((c, bmn, bmx)) =>
              if (t.offset <= cum + c) {
                out = Target(t.g, t.rank, bmn, bmx, t.offset - cum, c)
                found = true
              }
              cum += c
            case None => ()
          }
          b += 1
        }
        assert(found, s"group ${t.g} rank ${t.rank} not found in refinement bins")
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
        stalled.groupBy(t => (t.g, t.lo, t.hi)).foreach { case ((g, lo, hi), ts) =>
          val hist = vals
            .filter(col("g") === lit(g) && col("v") >= lo && col("v") <= hi)
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
              if (t.offset <= cum + c) {
                resolved((t.g, t.rank)) = value; done = true
              }
              cum += c
            }
            assert(done, s"group $g rank ${t.rank} not found in value histogram")
          }
        }
        active = progressing
      }
      settle()
    }

    if (active.nonEmpty) {
      // final: collect each surviving candidate set (≤ collectMax each)
      // in ONE scan and index the exact within-range rank
      val ranges = active.map(t => (t.g, t.lo, t.hi)).distinct.toSeq
      val byRange = vals.select(col("v"), rangeIdxExpr(ranges).as("rix"))
        .filter(col("rix") >= 0)
        .collect().map(r => r.getInt(1) -> r.getDouble(0))
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).sorted }
      scans += 1
      active.foreach { t =>
        val xs = byRange(ranges.indexOf((t.g, t.lo, t.hi)))
        maxCollected = math.max(maxCollected, xs.length)
        assert(xs.length == t.cnt,
          s"candidate count drifted: ${xs.length} vs ${t.cnt}")
        resolved((t.g, t.rank)) = xs((t.offset - 1).toInt)
      }
    }

    val out = hsByGroup.map { case (g, hs) =>
      g -> hs.map { h =>
        val (rlo, rhi) = (math.floor(h).toLong, math.ceil(h).toLong)
        val (vlo, vhi) = (resolved((g, rlo)), resolved((g, rhi)))
        vlo + (h - rlo) * (vhi - vlo)
      }
    }
    (out, Stats(scans, maxCollected))
  }
}
