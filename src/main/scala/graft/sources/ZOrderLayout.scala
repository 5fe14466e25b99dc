package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout + file-level min/max data skipping —
  * multi-dimensional scan pruning for predicates the partition scheme
  * doesn't cover.
  *
  * [[PartitionedTables]] prunes on ONE dominant column (the date);
  * [[BucketedTables]] co-locates ONE join key. The third recurring
  * shape at 100 TB is a selective predicate over TWO OR MORE columns
  * (part × supplier, user × item, lat × lon): sorting the data by
  * either column alone clusters that column only — a filter on the
  * other still touches every file. Interleaving the bits of both keys
  * (the Morton/Z space-filling curve) and sorting by the interleave
  * maps each file to a RECTANGLE of the key space, so per-file
  * [min,max] ranges become selective on every interleaved dimension at
  * once. This is the public lakehouse data-layout technique (Delta/
  * Iceberg `OPTIMIZE ZORDER BY`), built here from first principles on
  * plain parquet: the layout is an ingest-time decision, and skipping
  * is a driver-side file-list filter against a KB-sized stats table —
  * pruning happens before a single row (or parquet footer) is read.
  *
  * The bit spread uses the standard binary-magic-number interleave
  * (Stanford Bit Twiddling Hacks, public domain), expressed entirely
  * in built-in shift/mask Column ops — whole-stage codegen, no UDF.
  *
  * Correctness never depends on the stats: skipping only drops files
  * whose [min,max] provably cannot satisfy the predicate, and the
  * predicate is still applied to every surviving row. q74 gates the
  * skipped scan hash-exact against the plain full-scan oracle;
  * ZOrderSpec asserts the pruning itself (both single-dimension
  * filters skip files on the z layout; a linearly-sorted layout skips
  * NOTHING on its secondary dimension).
  */
object ZOrderLayout {

  /** Spread the low 32 bits of `x` to the even bit positions of a
    * 64-bit value (binary magic numbers). */
  private def spread(x: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (shift, mask)) =>
        acc.bitwiseOR(shiftleft(acc, shift)).bitwiseAND(lit(mask))
    }
  }

  /** Morton z-value of two non-negative int columns (`a` even bits,
    * `b` odd bits). Pure shift/mask arithmetic — codegen end to end. */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Bits each dimension is scaled to before interleaving. */
  val ScaleBits = 16

  /** Scale `x` from `[lo, hi]` onto `[0, 2^ScaleBits)`. Raw
    * interleaving breaks when the dimensions have unequal bit widths
    * (a 4-bit key's bits all land below a 8-bit key's, so file
    * z-ranges never constrain the narrow key — exactly what a first
    * cut of this spec measured); scaling to a common width first is
    * what makes the curve alternate meaningfully, and is what the
    * production OPTIMIZE ZORDER implementations do.
    *
    * The arithmetic is DOUBLE, not long: `(x - lo) * 65535` in long
    * overflows once the domain is wider than ~1.4e14 (epoch-micros
    * timestamps), silently scrambling the layout — skipping stays
    * correct (real per-file min/max + the reapplied row predicate)
    * but the clustering benefit evaporates. In double the ratio
    * `(x-lo)/(hi-lo)` is computed from exactly-representable or
    * gracefully-rounded operands at any domain width; beyond 2^53 the
    * scaled value loses low-bit precision, which only coarsens the
    * curve, never breaks it. Clamped to the mask against boundary
    * rounding. */
  private def scaled(x: Column, lo: Long, hi: Long): Column = {
    val mask = (1L << ScaleBits) - 1
    if (hi <= lo) lit(0L)
    else least(
      floor((x.cast("double") - lit(lo.toDouble)) /
        lit(hi.toDouble - lo.toDouble) * lit(mask.toDouble)).cast("long"),
      lit(mask))
  }

  /** Z-value over dimensions scaled to a common [[ScaleBits]] width —
    * the layout key. `(aLo,aHi)`/`(bLo,bHi)` are the ingest-time
    * domain bounds (one tiny agg, computed by [[writeZOrdered]]). */
  def zvalueScaled(
      a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long): Column =
    zvalue(scaled(a, aLo, aHi), scaled(b, bLo, bHi))

  /** JVM twin of [[zvalueScaled]] — same double scaling, same clamp,
    * bit-for-bit agreement with the Column path at any domain width. */
  def zvalueScaledJvm(
      a: Long, aLo: Long, aHi: Long, b: Long, bLo: Long, bHi: Long): Long = {
    val mask = (1L << ScaleBits) - 1
    def sc(x: Long, lo: Long, hi: Long): Long =
      if (hi <= lo) 0L
      else math.min(
        math.floor((x.toDouble - lo.toDouble) /
          (hi.toDouble - lo.toDouble) * mask.toDouble).toLong,
        mask)
    zvalueJvm(sc(a, aLo, aHi), sc(b, bLo, bHi))
  }

  /** JVM twin of [[zvalue]], for specs and driver-side checks. */
  def zvalueJvm(a: Long, b: Long): Long = {
    def sp(x0: Long): Long = {
      var x = x0 & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    sp(a) | (sp(b) << 1)
  }

  /** Per-file [min,max] of the two z-ordered dimensions — the whole
    * skipping index. KB-sized at any corpus scale (one row per file),
    * computed once at ingest alongside the layout write. */
  final case class FileStats(
      path: String, minA: Long, maxA: Long, minB: Long, maxB: Long)

  /** Write `df` z-ordered by (`colA`, `colB`) into `nFiles` files at
    * `path`, and return the per-file stats index. `repartitionByRange`
    * on the z-value gives contiguous, balanced z-ranges per file (the
    * range exchange samples — at 100 TB this is the same single
    * shuffle any sort-based OPTIMIZE pays); each file then covers a
    * rectangle of (a, b) space. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Seq[FileStats] =
    writeCurveOrdered(df, path, colA, colB, nFiles, zvalue)

  /** Same layout write keyed by the Hilbert curve ([[HilbertCurve]])
    * instead of the Morton interleave — tighter per-file rectangles
    * from the curve's strict adjacency (HilbertSpec quantifies it
    * against the z layout on the same corpus). */
  def writeHilbertOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Seq[FileStats] =
    writeCurveOrdered(df, path, colA, colB, nFiles, HilbertCurve.hilbert_key)

  private def writeCurveOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int, key: (Column, Column) => Column): Seq[FileStats] = {
    val bounds = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val k = key(
      scaled(col(colA), bounds.getLong(0), bounds.getLong(1)),
      scaled(col(colB), bounds.getLong(2), bounds.getLong(3))).as("__k")
    df.select(col("*"), k)
      .repartitionByRange(nFiles, col("__k"))
      .sortWithinPartitions("__k")
      .drop("__k")
      .write.mode("overwrite").parquet(path)
    collectStats(df.sparkSession, path, colA, colB)
  }

  /** Build the stats index by scanning the written layout once (ingest
    * cost, not query cost). */
  def collectStats(
      spark: SparkSession, path: String, colA: String,
      colB: String): Seq[FileStats] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(colA)).as("minA"), max(col(colA)).as("maxA"),
        min(col(colB)).as("minB"), max(col(colB)).as("maxB"))
      .collect()
      .map(r => FileStats(r.getString(0), r.getAs[Number]("minA").longValue,
        r.getAs[Number]("maxA").longValue, r.getAs[Number]("minB").longValue,
        r.getAs[Number]("maxB").longValue))
      .toSeq.sortBy(_.path)

  /** Files whose [min,max] rectangle intersects `[aLo,aHi] × [bLo,bHi]`
    * — the only files a conjunctive range predicate can match. `None`
    * bounds leave that dimension unconstrained. */
  def selectFiles(
      stats: Seq[FileStats], aLo: Option[Long], aHi: Option[Long],
      bLo: Option[Long], bHi: Option[Long]): Seq[String] =
    stats.filter { s =>
      aLo.forall(s.maxA >= _) && aHi.forall(s.minA <= _) &&
        bLo.forall(s.maxB >= _) && bHi.forall(s.minB <= _)
    }.map(_.path)

  /** Read only the files that can match, then apply the REAL predicate
    * to the survivors — exact by construction (skipping is a superset
    * pre-filter; the row predicate does the rest). */
  def skippingScan(
      spark: SparkSession, stats: Seq[FileStats], colA: String, colB: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val files = selectFiles(stats, Some(aLo), Some(aHi), Some(bLo), Some(bHi))
    val src =
      if (files.isEmpty) spark.read.parquet(stats.map(_.path): _*).limit(0)
      else spark.read.parquet(files: _*)
    src.filter(col(colA).between(aLo, aHi) && col(colB).between(bLo, bHi))
  }
}
