package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encode as a native codegen expression (the
  * same shape as [[VectorOps.nearest_cells]]: no UDF, stays inside
  * WholeStageCodegen, codebooks ride the generated class as a
  * reference object).
  */
object PqOps {

  /** `pq_encode(vec, codebooks)` → `array<int>` of length M: for each
    * subspace, the index of the L2-nearest codeword of the
    * L2-NORMALIZED input (PQ for cosine geometry runs on the unit
    * sphere; normalizing inside the expression keeps the corpus scan a
    * single pass over raw vectors). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    SqlShims.column(PqEncode(SqlShims.expression(vec),
      codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** Also called from generated code. Ties break to the lowest
    * codeword index (strict `<` keeps the first minimum — the same
    * contract the trainer's assignment loop uses). */
  def pqEncode(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val dim = vec.numElements()
    val sub = dim / m
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = vec.getDouble(i); nv += x * x; i += 1 }
    val inv = if (nv == 0.0) 0.0 else 1.0 / math.sqrt(nv)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      val words = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var d = 0.0
        i = 0
        while (i < sub) {
          val diff = vec.getDouble(base + i) * inv - w(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Codebooks as nested Seqs (not raw arrays) so case-class equality and
  * semanticEquals work; the primitive matrix is derived lazily for
  * eval/codegen (see [[NearestCells]]). */
case class PqEncode(
    child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqOps.pqEncode(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pqCodebooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PqOps.pqEncode($v, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}
