package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-class pattern mask used for "top-K most frequent patterns"
  * profiling (reference: org/apache/flink/stats/StringStatsTuple.java:24-46):
  * strip accents, then per character
  *   a-z -> 'a', A-Z -> 'A', 0-9 -> '#', space/tab -> 'b', '#' -> '#',
  *   keep { / : . - ' }, anything else -> '?'.
  *
  * Exposed three ways: a plain Scala function ([[PatternMask.mask]]),
  * a native Catalyst expression with codegen ([[PatternMaskExpression]])
  * so the hot path stays inside WholeStageCodegen, and a [[Column]]
  * helper ([[PatternMask.pattern_mask]]).
  */
object PatternMask {

  /** Accent folding equivalent to commons-lang3 `StringUtils.stripAccents`:
    * NFD-normalize then drop combining diacritical marks. */
  def stripAccents(s: String): String = {
    // Fast path: pure ASCII needs no normalization (the common case at
    // 100 TB scale; avoids the Normalizer allocation per value).
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { ascii = s.charAt(i) < 128; i += 1 }
    if (ascii) s
    else {
      val norm = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(norm.length)
      var j = 0
      while (j < norm.length) {
        val c = norm.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      sb.toString
    }
  }

  def mask(value: String): String = {
    val v = stripAccents(value)
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c >= 'a' && c <= 'z') sb.append('a')
      else if (c >= 'A' && c <= 'Z') sb.append('A')
      else if (c >= '0' && c <= '9') sb.append('#')
      else if (c == ' ' || c == '\t') sb.append('b')
      else if (c == '#') sb.append('#')
      else if (c == '/' || c == ':' || c == '.' || c == '-' || c == '\'') sb.append(c)
      else sb.append('?')
      i += 1
    }
    sb.toString
  }

  /** Entry point called from generated code. */
  def maskUtf8(value: UTF8String): UTF8String =
    UTF8String.fromString(mask(value.toString))

  def pattern_mask(c: Column): Column =
    SqlShims.column(PatternMaskExpression(SqlShims.expression(c)))
}

case class PatternMaskExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PatternMask.maskUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PatternMask.maskUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PatternMaskExpression =
    copy(child = newChild)

  override def prettyName: String = "pattern_mask"
}
