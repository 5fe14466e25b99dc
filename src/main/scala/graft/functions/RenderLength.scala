package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Rendered-value length of floating-point / decimal values under the
  * Calcite-`SqlFunctions` conventions ([[graft.profile.ValueRender]];
  * reference: org/apache/flink/stats/CastUtils.java:9-45,
  * StatsPojo.java:403-433), as a native codegen expression: the q05
  * length-stats scan stays inside WholeStageCodegen instead of paying
  * a per-row black-box Scala UDF (closure call + null boxing) — the
  * same port already done for [[PatternMask]]/[[ArrayOps]]/[[VectorOps]].
  */
object RenderLength {

  /** Entry points called from generated code. */
  def doubleLen(d: Double): Int =
    graft.profile.ValueRender.doubleAsStr(d).length
  def floatLen(f: Float): Int =
    graft.profile.ValueRender.floatAsStr(f).length
  /** Takes the value pre-cast to string (exact decimal text), so the
    * expression needs no Decimal-internal plumbing. */
  def decimalLen(s: UTF8String): Int =
    graft.profile.ValueRender
      .bigDecimalAsStr(new java.math.BigDecimal(s.toString)).length

  def double_render_length(c: Column): Column =
    SqlShims.column(RenderLengthExpression(SqlShims.expression(c), "double"))
  def float_render_length(c: Column): Column =
    SqlShims.column(RenderLengthExpression(SqlShims.expression(c), "float"))
  /** `c` must already be a string column (cast upstream). */
  def decimal_render_length(c: Column): Column =
    SqlShims.column(RenderLengthExpression(SqlShims.expression(c), "decimal"))
}

case class RenderLengthExpression(child: Expression, mode: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = mode match {
    case "double" => RenderLength.doubleLen(input.asInstanceOf[Double])
    case "float"  => RenderLength.floatLen(input.asInstanceOf[Float])
    case _        => RenderLength.decimalLen(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = mode match {
      case "double" => "doubleLen"
      case "float"  => "floatLen"
      case _        => "decimalLen"
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.RenderLength.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RenderLengthExpression =
    copy(child = newChild)

  override def prettyName: String = s"${mode}_render_length"
}
