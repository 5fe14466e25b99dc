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
  * Scope (documented, spec-pinned): both directions — backward (last
  * right at-or-before, `forward = false`) and forward (first right
  * at-or-after, `forward = true`). Duplicate right (key, time) rows
  * resolve to the physically-LAST in sort order backward and the
  * physically-FIRST forward, so callers needing a deterministic winner
  * among exact ties pre-sort with a tie-break column — same contract
  * as the window composition's `tieBreak`. NULL semantics follow SQL
  * equality, not the natural row ordering (which sorts NULLs first and
  * would let them compare): a left row with a NULL key or time emits
  * unmatched; right rows with NULL key or time are skipped, never
  * match candidates.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false)
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
    case AsofJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false)
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
      val fwd = forward

      new Iterator[InternalRow] {
        // backward only — the single held candidate: last right row
        // seen whose key equals heldKey (a copy -- projections reuse
        // their buffers). Forward needs no held state: the match is
        // the un-consumed head of the right iterator.
        private var heldKey: UnsafeRow = _
        private var held: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          // SQL equality semantics, not natural-order semantics: a
          // NULL left key matches nothing and a NULL left time has no
          // position — emit unmatched without advancing the right side
          // (null keys/times sort FIRST, so these rows lead the
          // partition and the merge state is still empty).
          if (lKey.anyNull || lTimeRow.isNullAt(0)) {
            return resultProj(joined(lRow, nullRight))
          }
          if (held != null && keyOrd.compare(heldKey, lKey) != 0) {
            held = null; heldKey = null
          }
          // discard right rows that can never match any left row: NULL
          // key or time (never candidates under SQL equality), or keys
          // below the current left key
          while (rBuf.hasNext && {
              val h = rBuf.head
              val hk = rKeyProj(h)
              hk.anyNull || rTimeProj(h).isNullAt(0) ||
                keyOrd.compare(hk, lKey) < 0
            }) {
            rBuf.next()
          }
          val lTime = lTimeRow.copy()
          if (fwd) {
            // forward: drop same-key rows strictly BEFORE the left
            // time (left times ascend, so they can't match later left
            // rows either); the head — if still same-key — is the
            // earliest at-or-after, i.e. the match. It is NOT consumed:
            // it may also match subsequent left rows.
            while (rBuf.hasNext && {
                val h = rBuf.head
                keyOrd.compare(rKeyProj(h), lKey) == 0 &&
                  timeOrd.compare(rTimeProj(h), lTime) < 0
              }) {
              rBuf.next()
            }
            val m =
              if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0)
                rBuf.head
              else nullRight
            resultProj(joined(lRow, m))
          } else {
            // backward: consume same-key right rows at-or-before the
            // left time; the LAST one consumed is the as-of match
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
