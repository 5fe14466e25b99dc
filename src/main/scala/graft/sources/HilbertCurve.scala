package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve key — the locality-preserving
  * alternative to [[ZOrderLayout]]'s Morton interleave.
  *
  * The Z curve makes long diagonal jumps at every power-of-two
  * boundary (the "seam" between quadrants), so a contiguous z-range
  * file can cover two distant rectangles of key space; the Hilbert
  * curve visits every cell of one quadrant before leaving it
  * (consecutive curve positions are always grid-ADJACENT), so equal
  * curve ranges map to tighter bounding rectangles — the reason the
  * production lakehouse optimizers moved from ZORDER to Hilbert
  * clustering. Same deal as z: the curve key is an ingest-time sort
  * key only; correctness never depends on it (per-file [min,max]
  * skipping + the reapplied row predicate do).
  *
  * Algorithm: the standard iterative xy→d rotation walk (Hilbert 1891
  * via the public-domain formulation on the space-filling-curve
  * literature), 16 bits per dimension → a 32-bit key. Exposed as a
  * JVM function plus a native Catalyst expression whose codegen emits
  * a static call — the layout write stays inside WholeStageCodegen,
  * no UDF anywhere (the PatternMask pattern).
  */
object HilbertCurve {

  val BitsPerDim = 16

  /** Hilbert distance of grid cell (x, y), both in [0, 2^16). */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << (BitsPerDim - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert_key(a: Column, b: Column): Column =
    SqlShims.column(HilbertKeyExpression(
      SqlShims.expression(a), SqlShims.expression(b)))
}

case class HilbertKeyExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sources.HilbertCurve.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKeyExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_key"
}
