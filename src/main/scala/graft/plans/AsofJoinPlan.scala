package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator-semantics rung of
  * the custom-operator ladder: a logical node, a planner [[Strategy]],
  * and a physical operator with real distribution/ordering
  * requirements, so Catalyst plans it like any built-in join.
  *
  * Semantics: LEFT OUTER as-of — for every left row, the single LAST
  * right row with the same key and `rightTime <= leftTime` (the `<=`
  * convention of DuckDB/Pandas `ASOF LEFT JOIN`); unmatched left rows
  * carry nulls. Equal to [[graft.operators.AsofJoin.backward]] (the
  * union+window composition) — spec-asserted — but as an engine
  * operator:
  *
  *  - '''Requirements, not manual shuffles''': the exec declares
  *    `ClusteredDistribution(keys)` per child and per-child sort
  *    `(keys..., time)`; `EnsureRequirements` inserts the co-located
  *    hash exchanges + sorts exactly as it does for a sort-merge join.
  *    Cost shape = one shuffle + sort per side, same as SMJ.
  *  - '''O(1) state per partition''': the merge holds ONE candidate
  *    right row (the latest at-or-before the current left row) — vs
  *    the window composition, which unions both sides through one
  *    shuffle and carries running-last state per row. No pairwise
  *    blow-up on hot keys, no whole-key buffering.
  *  - '''Streaming iterators''': both children are consumed once, in
  *    order; output preserves the left child's (key, time) order
  *    (declared via `outputOrdering`, so a downstream
  *    keys-ordered consumer plans no extra sort).
  *
  * Registered two ways: per-session via
  * `spark.experimental.extraStrategies` (done lazily by
  * [[graft.operators.AsofJoin.backwardNative]]) and cluster-wide via
  * [[graft.functions.GraftExtensions]].
  *
  * Scope (documented, spec-pinned): backward direction; duplicate
  * right (key, time) rows resolve to the physically-last in sort
  * order, so callers needing a deterministic winner among exact ties
  * pre-sort with a tie-break column — same contract as the window
  * composition's `tieBreak`.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same co-location contract as a sort-merge join: both children
    * hash-clustered on their keys (EnsureRequirements aligns the two
    * exchanges so equal keys land in equal partition ids). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** The merge emits left rows in their incoming order. */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rWidth = rOut.length
    val outAttrs = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of children have mismatched partitioning: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // NOTE the name: inside the anonymous Iterator below, a local
      // called `buffered` would be shadowed by Iterator's OWN
      // `.buffered` method -- which wraps the iterator being defined,
      // so every head/hasNext would recursively re-enter next() and
      // drain the left side (a real bug this operator shipped without,
      // caught by the -Wconf shadowing warning)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // the single held candidate: last right row seen whose key
        // equals heldKey (a copy -- projections reuse their buffers)
        private var heldKey: UnsafeRow = _
        private var held: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          if (held != null && keyOrd.compare(heldKey, lKey) != 0) {
            held = null; heldKey = null
          }
          // discard right rows with smaller keys
          while (rBuf.hasNext &&
              keyOrd.compare(rKeyProj(rBuf.head), lKey) < 0) {
            rBuf.next()
          }
          // consume same-key right rows at-or-before the left time;
          // the LAST one consumed is the as-of match
          val lTime = lTimeProj(lRow).copy()
          while (rBuf.hasNext && {
              val h = rBuf.head
              keyOrd.compare(rKeyProj(h), lKey) == 0 &&
                timeOrd.compare(rTimeProj(h), lTime) <= 0
            }) {
            held = rBuf.next().copy().asInstanceOf[UnsafeRow]
            if (heldKey == null) heldKey = lKey.copy()
          }
          resultProj(joined(lRow, if (held != null) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategyRegistration {
  /** Idempotently add [[AsofJoinStrategy]] to the session's planner. */
  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
    }
  }
}
