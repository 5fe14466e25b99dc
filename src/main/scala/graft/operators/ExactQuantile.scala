package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** EXACT interpolated quantiles with bounded per-task (and driver)
  * memory — the scale-true replacement for `percentile`, whose
  * aggregation buffer holds EVERY value of its column/group (the
  * documented weakness of the one-scan q20/q50 forms).
  *
  * Iterative histogram refinement (the classic distributed selection
  * algorithm — range narrowing by counting):
  *
  *  1. one scan → per-group (count, NaN count, finite min/max);
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
  * Active (group, range) targets ride a BROADCAST-JOINED range table
  * keyed by group — not literal predicates — so the expression tree is
  * constant-size no matter how many groups are active: per-domain
  * quantiles over 10⁴+ groups plan exactly like 5 groups
  * (ExactQuantileSpec pins the scan count). Driver state is O(groups)
  * for the stats pass plus the surviving candidates in the final pass
  * (≤ `collectMax` per active range; for many small groups each
  * group's whole value set is below `collectMax`, so the final pass
  * collects about the rows a single `percentile` buffer would have
  * held for ONE group — bounded per range, spec-asserted).
  *
  * State: `buckets` counters per active range per task (KBs),
  * ≤ `collectMax` doubles per range on the driver at the end. Passes:
  * 1 + ceil(log_buckets(n / collectMax)) + 1 — at 10^12 rows with the
  * defaults that is 4 scans, each narrower than the last (refinement
  * filters push down to parquet row-group stats). Interpolation
  * follows `percentile` / DuckDB `quantile_cont`: rank h = 1 + p·(n−1),
  * result = v_⌊h⌋ + (h−⌊h⌋)·(v_⌈h⌉ − v_⌊h⌋) over 1-based order
  * statistics.
  *
  * Nulls are ignored (as `percentile` does). NaN ORDERS LAST (the
  * largest value) — the ordering Spark `percentile`, Spark sorts, and
  * DuckDB `quantile_cont` all share — so a rank landing past the
  * finite values returns NaN, and a rank interpolating INTO the NaN
  * tail returns NaN (spec-pinned in ExactQuantileSpec; a 100 TB
  * numeric column will contain NaNs). Null GROUP KEYS are rejected
  * loudly (the range table joins by group key; SQL null-equality would
  * silently drop them).
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

  /** Exact quantiles per group-key value. Group keys must be non-null
    * and join-comparable (string/numeric/date/...). Returns an empty
    * map for an empty input. */
  def groupedQuantilesWithStats(
      df: DataFrame, groupCol: String, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): (Map[Any, Seq[Double]], Stats) = {
    require(ps.forall(p => p >= 0 && p <= 1), s"percentiles out of [0,1]: $ps")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull)
      .select(col(groupCol).as("g"), v.as("v"))
    // finite values only below; NaNs are counted here and order LAST
    val vals = rows.filter(!isnan(col("v")))
    val groupStats = rows.groupBy("g").agg(
      count(col("v")).as("n"),
      count(when(isnan(col("v")), lit(1))).as("nNan"),
      min(when(!isnan(col("v")), col("v"))).as("mn"),
      max(when(!isnan(col("v")), col("v"))).as("mx")
    ).collect().map(r => (r.get(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
      if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    var scans = 1
    var maxCollected = 0
    if (groupStats.isEmpty) return (Map.empty, Stats(scans, 0))
    require(groupStats.forall(_._1 != null),
      s"null group key in $groupCol: the range table joins by group key")

    // per group: 1-based continuous ranks for floor(h)/ceil(h), over
    // the TOTAL count (NaNs included — they hold the top ranks)
    val hsByGroup: Map[Any, Seq[Double]] = groupStats.map { case (g, n, _, _, _) =>
      g -> ps.map(p => 1.0 + p * (n - 1).toDouble)
    }.toMap

    final case class Target(g: Any, rank: Long, lo: Double, hi: Double,
        offset: Long, cnt: Long)
    val resolved = scala.collection.mutable.Map[(Any, Long), Double]()
    var active = groupStats.flatMap { case (g, n, nNan, mn, mx) =>
      val nFinite = n - nNan
      hsByGroup(g)
        .flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong))
        .distinct.flatMap { r =>
          if (r > nFinite) { resolved((g, r)) = Double.NaN; None }
          else Some(Target(g, r, mn, mx, r, nFinite))
        }
    }.toBuffer

    def settle(): Unit = {
      val (done, rest) = active.partition(t => t.lo == t.hi)
      done.foreach(t => resolved((t.g, t.rank)) = t.lo)
      active = rest
    }
    settle()

    // (group, lo, hi) range table, broadcast-joined to the values by
    // group key. Same-group ranges are disjoint BY CONSTRUCTION
    // (refinement bins are strictly value-ordered, dedup'd when equal)
    // and different groups never share rows, so the between-filter
    // keeps at most one joined row per value — and the plan is the
    // same one join whether 5 groups are active or 10⁵ (a literal
    // when-chain would grow the expression tree per range and choke
    // the planner in the thousands).
    val gType = rows.schema("g").dataType
    val rangeSchema = StructType(Seq(
      StructField("g", gType),
      StructField("rix", IntegerType, nullable = false),
      StructField("lo", DoubleType, nullable = false),
      StructField("hi", DoubleType, nullable = false)))
    def inRanges(ranges: Seq[(Any, Double, Double)]): DataFrame = {
      val rdf = spark.createDataFrame(
        ranges.zipWithIndex.map { case ((g, lo, hi), i) =>
          Row(g, i, lo, hi) }.asJava, rangeSchema)
      vals.join(broadcast(rdf), Seq("g"))
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
    }

    while (active.exists(_.cnt > collectMax)) {
      val ranges = active.map(t => (t.g, t.lo, t.hi)).distinct.toSeq
      val rangeIx = ranges.zipWithIndex.toMap
      val width = greatest((col("hi") - col("lo")) / buckets,
        lit(java.lang.Double.MIN_VALUE))
      val bins = inRanges(ranges)
        .select(col("v"), col("rix"),
          least(floor((col("v") - col("lo")) / width).cast("long"),
            lit(buckets - 1L)).as("b"))
        .groupBy("rix", "b")
        .agg(count(col("v")).as("c"), min(col("v")).as("bmn"),
          max(col("v")).as("bmx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      scans += 1
      active = active.map { t =>
        val rix = rangeIx((t.g, t.lo, t.hi))
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
      // range has fewer distinct VALUES than bins, so resolve ALL
      // stalled ranges with one bounded distinct-value histogram scan.
      val (stalled, progressing) = active.partition(t =>
        t.lo < t.hi && (t.hi - t.lo) / buckets == 0 && t.cnt > collectMax)
      if (stalled.nonEmpty) {
        val sRanges = stalled.map(t => (t.g, t.lo, t.hi)).distinct.toSeq
        val sIx = sRanges.zipWithIndex.toMap
        val hist = inRanges(sRanges)
          .groupBy("rix", "v").agg(count(col("v")).as("c"))
          .orderBy("rix", "v").collect()
          .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
          .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
        scans += 1
        stalled.foreach { t =>
          var cum = 0L
          val it = hist(sIx((t.g, t.lo, t.hi))).iterator
          var done = false
          while (!done && it.hasNext) {
            val (value, c) = it.next()
            if (t.offset <= cum + c) {
              resolved((t.g, t.rank)) = value; done = true
            }
            cum += c
          }
          assert(done, s"group ${t.g} rank ${t.rank} not found in value histogram")
        }
        active = progressing
      }
      settle()
    }

    if (active.nonEmpty) {
      // final: collect each surviving candidate set (≤ collectMax each)
      // in ONE scan and index the exact within-range rank
      val ranges = active.map(t => (t.g, t.lo, t.hi)).distinct.toSeq
      val rangeIx = ranges.zipWithIndex.toMap
      val byRange = inRanges(ranges)
        .select(col("rix"), col("v"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1))
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).sorted }
      scans += 1
      active.foreach { t =>
        val xs = byRange(rangeIx((t.g, t.lo, t.hi)))
        maxCollected = math.max(maxCollected, xs.length)
        assert(xs.length == t.cnt,
          s"candidate count drifted: ${xs.length} vs ${t.cnt}")
        resolved((t.g, t.rank)) = xs((t.offset - 1).toInt)
      }
    }

    val out = hsByGroup.map { case (g, hs) =>
      g -> hs.map { h =>
        val rlo = math.floor(h).toLong
        val rhi = math.ceil(h).toLong
        val vlo = resolved((g, rlo))
        // exact-rank hit takes v_⌊h⌋ directly: 0·(NaN−v) must not turn
        // a finite order statistic into NaN when the NEXT rank is NaN
        if (h == rlo.toDouble) vlo
        else {
          val vhi = resolved((g, rhi))
          vlo + (h - rlo) * (vhi - vlo)
        }
      }
    }
    (out, Stats(scans, maxCollected))
  }

  /** EXACT quantiles of a WEIGHTED population with the same bounded
    * memory — semantically identical to `quantile_cont` over the
    * multiset where each row appears `weightCol` times, WITHOUT
    * materializing that expansion (the expansion is the oracle/spec
    * twin, not the production path). The rank space is the total
    * weight W (h = 1 + p·(W−1)); refinement descends by CUMULATIVE
    * WEIGHT while the collect bound still counts ROWS (a single heavy
    * row is one candidate however large its weight). Use cases:
    * token-weighted document-length percentiles, multiplicity-weighted
    * bootstrap quantiles (q147's Poisson draws), units-weighted price
    * quantiles — anywhere expanding would multiply the corpus.
    *
    * Weights must be positive integers (longs); null/≤0-weight rows
    * are ignored, as are null values. NaN values order last, carrying
    * their weight (matching the expanded-multiset semantics). */
  def weightedQuantiles(
      df: DataFrame, valueCol: String, weightCol: String, ps: Seq[Double],
      buckets: Int = 4096, collectMax: Int = 65536): Seq[Double] = {
    require(ps.forall(p => p >= 0 && p <= 1), s"percentiles out of [0,1]: $ps")
    val v = col(valueCol).cast("double")
    val wc = col(weightCol).cast("long")
    val rows = df.filter(v.isNotNull && wc.isNotNull && wc > 0)
      .select(v.as("v"), wc.as("w"))
    val vals = rows.filter(!isnan(col("v")))
    val st = rows.agg(
        sum(col("w")).as("tw"),
        sum(when(isnan(col("v")), col("w")).otherwise(0L)).as("twNan"),
        min(when(!isnan(col("v")), col("v"))).as("mn"),
        max(when(!isnan(col("v")), col("v"))).as("mx"))
      .collect().head
    if (st.isNullAt(0)) return ps.map(_ => Double.NaN)
    val totalW = st.getLong(0)
    val wNan = st.getLong(1)
    val (mn, mx) = (if (st.isNullAt(2)) Double.NaN else st.getDouble(2),
      if (st.isNullAt(3)) Double.NaN else st.getDouble(3))
    val wFinite = totalW - wNan
    val hs = ps.map(p => 1.0 + p * (totalW - 1).toDouble)

    final case class T(rank: Long, lo: Double, hi: Double,
        offset: Long, wcnt: Long, rows: Long)
    val resolved = scala.collection.mutable.Map[Long, Double]()
    var active = hs.flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong))
      .distinct.flatMap { r =>
        if (r > wFinite) { resolved(r) = Double.NaN; None }
        else Some(T(r, mn, mx, r, wFinite, Long.MaxValue))
      }.toBuffer

    def settle(): Unit = {
      val (done, rest) = active.partition(t => t.lo == t.hi)
      done.foreach(t => resolved(t.rank) = t.lo)
      active = rest
    }
    settle()

    def inRange(lo: Double, hi: Double) =
      vals.filter(col("v") >= lo && col("v") <= hi)

    while (active.exists(_.rows > collectMax)) {
      val ranges = active.map(t => (t.lo, t.hi)).distinct
      val binsByRange = ranges.map { case (lo, hi) =>
        val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_VALUE)
        val bins = inRange(lo, hi)
          .select(col("v"), col("w"),
            least(floor((col("v") - lit(lo)) / lit(width)).cast("long"),
              lit(buckets - 1L)).as("b"))
          .groupBy("b")
          .agg(sum(col("w")).as("ws"), count(col("v")).as("rows"),
            min(col("v")).as("bmn"), max(col("v")).as("bmx"))
          .collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
          .toMap
        (lo, hi) -> bins
      }.toMap
      active = active.map { t =>
        val bins = binsByRange((t.lo, t.hi))
        var (cum, b) = (0L, 0L)
        var out = t
        var found = false
        while (!found && b < buckets) {
          bins.get(b) match {
            case Some((ws, nRows, bmn, bmx)) =>
              if (t.offset <= cum + ws) {
                out = T(t.rank, bmn, bmx, t.offset - cum, ws, nRows)
                found = true
              }
              cum += ws
            case None => ()
          }
          b += 1
        }
        assert(found, s"weighted rank ${t.rank} not found in refinement bins")
        out
      }
      // stall guard, as in the grouped path: an ulp-narrow range full
      // of duplicates resolves through a bounded distinct-value pass
      val (stalled, progressing) = active.partition(t =>
        t.lo < t.hi && (t.hi - t.lo) / buckets == 0 && t.rows > collectMax)
      stalled.foreach { t =>
        val hist = inRange(t.lo, t.hi).groupBy("v").agg(sum(col("w")).as("ws"))
          .orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(1)))
        var cum = 0L
        var done = false
        hist.foreach { case (value, ws) =>
          if (!done && t.offset <= cum + ws) { resolved(t.rank) = value; done = true }
          cum += ws
        }
        assert(done, s"weighted rank ${t.rank} not found in value histogram")
      }
      active = progressing
      settle()
    }

    if (active.nonEmpty) {
      active.map(t => (t.lo, t.hi)).distinct.foreach { case (lo, hi) =>
        val xs = inRange(lo, hi).groupBy("v").agg(sum(col("w")).as("ws"))
          .orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(1)))
        active.filter(t => t.lo == lo && t.hi == hi).foreach { t =>
          var cum = 0L
          var done = false
          xs.foreach { case (value, ws) =>
            if (!done && t.offset <= cum + ws) { resolved(t.rank) = value; done = true }
            cum += ws
          }
          assert(done, s"weighted rank ${t.rank} unresolved in final collect")
        }
      }
    }

    hs.map { h =>
      val rlo = math.floor(h).toLong
      val vlo = resolved(rlo)
      if (h == rlo.toDouble) vlo
      else {
        val vhi = resolved(math.ceil(h).toLong)
        vlo + (h - rlo) * (vhi - vlo)
      }
    }
  }
}
