package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native nearest-centroid selection for IVF assignment/probing.
  *
  * `nearest_cells(vec, centroids, p)` returns the `p` centroid indices
  * with the highest cosine similarity to `vec`, ordered by (cosine
  * desc, cell asc). A single narrow projection replaces the previous
  * corpus×nlist `crossJoin` + `row_number` window (a ×nlist row blowup
  * plus a per-id sort shuffle): zero exchanges, stays inside
  * whole-stage codegen, and at 100 TB the assignment stage becomes a
  * pure map over the scan.
  *
  * The centroid matrix rides along as a codegen reference object (one
  * deserialized double[][] per executor), not as per-element literals —
  * nlist×dim literals would bloat the plan and break codegen at real
  * centroid counts.
  */
object VectorOps {

  def nearest_cells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    SqlShims.column(NearestCells(SqlShims.expression(vec),
      centroids.map(_.toIndexedSeq).toIndexedSeq, nprobe))

  /** Random-hyperplane sign sketch (Charikar STOC'02 SimHash for
    * cosine): bit p of the returned long = 1 iff `vec · planes(p) ≥ 0`.
    * One narrow codegen projection per row — the plane matrix rides as
    * a codegen reference object exactly like [[NearestCells]]'
    * centroids. */
  def hyperplane_sign_bits(vec: Column, planes: Array[Array[Double]]): Column =
    SqlShims.column(HyperplaneSignBits(SqlShims.expression(vec),
      planes.map(_.toIndexedSeq).toIndexedSeq))

  /** Also called from generated code. */
  def signBits(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val r = planes(p)
      var dot = 0.0
      var i = 0
      while (i < r.length) { dot += vec.getDouble(i) * r(i); i += 1 }
      if (dot >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Top-p cells by cosine; ties broken by ascending cell index
    * (first-max-wins, matching IvfIndex.train's assignment loop).
    * Also called from generated code. */
  def nearestCells(
      vec: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], p: Int): ArrayData = {
    val n = cents.length
    val dim = vec.numElements()
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = vec.getDouble(i); nv += x * x; i += 1 }
    val vnorm = math.sqrt(nv)
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cv = cents(c)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += vec.getDouble(i) * cv(i); i += 1 }
      val denom = vnorm * norms(c)
      sims(c) = if (denom == 0.0) 0.0 else dot / denom
      c += 1
    }
    val k = math.min(p, n)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < n) {
        if (!taken(c) && sims(c) > bestSim) { bestSim = sims(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `centroids` is a Seq-of-Seq (not raw arrays) so case-class equality
  * and semanticEquals work; the primitive matrix + norms are derived
  * lazily for eval/codegen. */
case class NearestCells(
    child: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]],
    nprobe: Int) extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map(v => math.sqrt(v.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VectorOps.nearestCells(v.asInstanceOf[ArrayData], matrix, norms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    val nrm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorOps.nearestCells($v, $m, $nrm, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

/** `planes` as Seq-of-Seq for case-class equality (see [[NearestCells]]). */
case class HyperplaneSignBits(
    child: Expression,
    planes: IndexedSeq[IndexedSeq[Double]]) extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VectorOps.signBits(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorOps.signBits($v, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBits =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sign_bits"
}
