package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — all pairs with equal key and the right timestamp
  * inside a half-open window anchored at the left timestamp:
  * `r.ts ∈ (l.ts + lowUs, l.ts + highUs]` (micros, `long`).
  *
  * Spark has no native range-join operator: a raw
  * `l.join(r, key && r.ts between ...)` keeps the range predicate out
  * of the hash-join key, so every (key) group degenerates to a
  * per-key nested loop — and with no equi-key at all Catalyst plans
  * BroadcastNestedLoopJoin, which is quadratic and caps the build side
  * at driver memory. Neither survives 100 TB.
  *
  * Banding restores an equi-join: quantize right timestamps into bands
  * of width `highUs - lowUs`; a left row's window spans at most TWO
  * consecutive bands, so exploding the left side to its (≤2) candidate
  * bands turns the range predicate into a plain shuffle hash/merge join
  * on (key, band), followed by the exact window filter. Cost: ≤2× the
  * left rows through one hash shuffle, candidates bounded by band
  * population — no nested loop anywhere (plan-asserted in PlanSpec).
  * At 100 TB both sides hash-partition on (key, band) and AQE's skew
  * split handles hot bands; the band width is the tuning knob that
  * trades candidate count against explode factor (kept at the window
  * span so the explode factor stays exactly 2).
  *
  * Column names must be disjoint across `left`/`right` (rename before
  * calling, as with any Spark self-join).
  */
object RangeJoin {

  /** Inner banded range join; returns `left.* ++ right.*` pairs.
    *
    * @param leftTs  left anchor timestamp column (epoch micros, long)
    * @param rightTs right event timestamp column (epoch micros, long)
    * @param lowUs   exclusive lower window offset relative to `leftTs`
    * @param highUs  inclusive upper window offset relative to `leftTs`
    */
  def bucketedInner(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lowUs: Long, highUs: Long): DataFrame = {
    require(highUs > lowUs, s"empty window: ($lowUs, $highUs]")
    val span = highUs - lowUs
    // floor division via pmod (exact for negative ts too). The double
    // division is exact: the numerator is a multiple of span and epoch
    // micros (~1.7e15) stay far below 2^53.
    def band(c: Column): Column =
      ((c - pmod(c, lit(span))) / lit(span)).cast("long")
    val r = right.withColumn("__rband", band(col(rightTs)))
    // the window (lts+low, lts+high] overlaps exactly the bands of its
    // two endpoints (low end is exclusive, so its band is band(lo+1))
    val l = left.withColumn("__lband",
      explode(array_distinct(array(
        band(col(leftTs) + lit(lowUs) + lit(1L)),
        band(col(leftTs) + lit(highUs))))))
    l.join(r,
        l("__lband") === r("__rband") &&
          col(leftKey) === col(rightKey) &&
          col(rightTs) > col(leftTs) + lit(lowUs) &&
          col(rightTs) <= col(leftTs) + lit(highUs))
      .drop("__lband", "__rband")
  }
}
