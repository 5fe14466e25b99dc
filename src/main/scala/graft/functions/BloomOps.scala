package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Bloom filter — the
  * pruning predicate of [[graft.operators.BloomPrune]].
  *
  * The filter rides the expression as its SERIALIZED bytes (the same
  * transport Spark's own runtime-filter injection uses): byte equality
  * gives the expression sane case-class semantics, and the probe-side
  * `BloomFilter` is rebuilt lazily once per deserialized instance —
  * per task, not per row. Codegen registers the rebuilt filter as a
  * plan reference object, so the hot loop is one virtual call on a
  * long — no boxing, no UDF node, whole-stage codegen intact.
  */
case class BloomMightContainLong(
    child: Expression, bits: IndexedSeq[Byte]) extends UnaryExpression {

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits.toArray))

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  /** Integral keys ONLY — a silent `cast("long")` on a double/decimal
    * key would probe a TRUNCATED value while the join compares the
    * exact one: the probe could miss a real partner (false negative =
    * wrong answers). Rejecting at analysis time keeps the
    * no-false-negative contract a type-level fact. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key column (probed as long), " +
        s"got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$f.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}

object BloomOps {
  /** Column wrapper: true iff `key` (integral — enforced at analysis
    * time, probed as long) might be in the filter serialized in
    * `bits`. No false negatives. */
  def mightContainLong(key: Column, bits: Array[Byte]): Column =
    SqlShims.column(BloomMightContainLong(
      SqlShims.expression(key), bits.toIndexedSeq))
}
