package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{BooleanType, DataType}
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

  override def nullSafeEval(v: Any): Any = bf.mightContainLong(v.asInstanceOf[Long])

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
  /** Column wrapper: true iff `key` (integral, probed as long) might be
    * in the filter serialized in `bits`. No false negatives. */
  def mightContainLong(key: Column, bits: Array[Byte]): Column =
    SqlShims.column(BloomMightContainLong(
      SqlShims.expression(key.cast("long")), bits.toIndexedSeq))
}
