package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native set ops over SORTED long arrays.
  *
  * `functions.array_intersect` hashes every element through boxed
  * `OpenHashSet[Any]` — measured ~20 µs per 860-element pair, which
  * made similarity-join verification the slowest stage of q12. When
  * both sides are sorted (one `sort_array` per document, amortized over
  * thousands of pair comparisons), intersection counting is a
  * two-pointer merge: primitive `getLong` reads, zero allocation, fully
  * inside WholeStageCodegen. This is the (b)-tier extension point of
  * SURVEY.md §7.2 — a scalar `Expression` with `doGenCode`, not a UDF.
  */
object ArrayOps {

  /** Count of common elements of two sorted long arrays (set
    * semantics: duplicates within one side count once — inputs are
    * distinct-element arrays in all our callers). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    SqlShims.column(SortedLongIntersectCount(
      SqlShims.expression(a), SqlShims.expression(b)))

  /** Cosine similarity of two double arrays — sequential accumulation
    * in index order, then `dot / (sqrt(na) * sqrt(nb))`: the SAME IEEE
    * operation sequence as the Column-level
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_) / (sqrt(...)*sqrt(...))`
    * it replaces, so DuckDB-oracle comparisons are unchanged — but
    * ~20x faster, because Spark evaluates higher-order functions
    * interpreted (no codegen) with per-element lambda dispatch. */
  def cosine_column(a: Column, b: Column): Column =
    SqlShims.column(DoubleArrayCosine(
      SqlShims.expression(a), SqlShims.expression(b)))

  /** Java impl, also called from generated code. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Per-element affine blend of two double arrays:
    * `out[i] = alpha*a[i] + beta*b[i]`. Both coefficients are explicit
    * (not `1-alpha`) so the oracle SQL can use the SAME double literals
    * and the IEEE operation sequence matches bit-for-bit. Codegen'd for
    * the same reason as [[cosine_column]] — `zip_with` would run an
    * interpreted per-element lambda on every row. */
  def mix_columns(a: Column, b: Column, alpha: Double, beta: Double): Column =
    SqlShims.column(DoubleArrayMix(
      SqlShims.expression(a), SqlShims.expression(b), alpha, beta))

  /** Java impl, also called from generated code. */
  def mix(a: ArrayData, b: ArrayData, alpha: Double, beta: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = alpha * a.getDouble(i) + beta * b.getDouble(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Java impl, also called from generated code. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

case class DoubleArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "double_array_cosine"
}

case class DoubleArrayMix(
    left: Expression, right: Expression, alpha: Double, beta: Double)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.mix(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], alpha, beta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayOps.mix($a, $b, $alpha, $beta)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayMix =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "double_array_mix"
}

case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayOps.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_long_intersect_count"
}
