package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.SqlShims

/** SQL-surface registration: exposes the engine's native expressions to
  * `spark.sql(...)` so a SQL-only user of the library gets the same
  * codegen'd functions the DataFrame API uses (the reference has no SQL
  * layer at all — this is part of re-expressing it Spark-first).
  *
  * After `GraftFunctions.registerAll(spark)`:
  * {{{
  *   SELECT pattern_mask(c_name) FROM customer
  *   SELECT double_array_cosine(a.emb, b.emb) FROM ...
  *   SELECT sorted_long_intersect_count(x, y) ...
  * }}}
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Name → expression builder for every SQL-exposed native function.
    * One list, two consumers: [[registerAll]] (existing sessions) and
    * [[GraftExtensions]] (config-driven cluster wiring). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "pattern_mask" ->
      ((exprs: Seq[Expression]) => PatternMaskExpression(exprs.head)),
    "double_array_cosine" ->
      ((exprs: Seq[Expression]) => DoubleArrayCosine(exprs(0), exprs(1))),
    "sorted_long_intersect_count" ->
      ((exprs: Seq[Expression]) => SortedLongIntersectCount(exprs(0), exprs(1))),
    "double_render_length" ->
      ((exprs: Seq[Expression]) => RenderLengthExpression(exprs.head, "double")),
    "float_render_length" ->
      ((exprs: Seq[Expression]) => RenderLengthExpression(exprs.head, "float")),
    "decimal_render_length" ->
      ((exprs: Seq[Expression]) => RenderLengthExpression(exprs.head, "decimal")),
    "nfc_normalize" ->
      ((exprs: Seq[Expression]) => NfcNormalizeExpression(exprs.head)),
    "hilbert_key" ->
      ((exprs: Seq[Expression]) =>
        graft.sources.HilbertKeyExpression(exprs(0), exprs(1))))

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      SqlShims.registerFunction(spark, name, builder)
    }
}
