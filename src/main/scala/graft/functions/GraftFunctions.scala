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

  def registerAll(spark: SparkSession): Unit = {
    SqlShims.registerFunction(spark, "pattern_mask",
      exprs => PatternMaskExpression(exprs.head))
    SqlShims.registerFunction(spark, "double_array_cosine",
      exprs => DoubleArrayCosine(exprs(0), exprs(1)))
    SqlShims.registerFunction(spark, "sorted_long_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)))
    SqlShims.registerFunction(spark, "double_render_length",
      exprs => RenderLengthExpression(exprs.head, "double"))
    SqlShims.registerFunction(spark, "float_render_length",
      exprs => RenderLengthExpression(exprs.head, "float"))
    SqlShims.registerFunction(spark, "decimal_render_length",
      exprs => RenderLengthExpression(exprs.head, "decimal"))
  }
}
