package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SqlShims

/** Backward as-of join — for each left row, the single latest right row
  * with `rightTs <= leftTs` on the same key (the time-series "most
  * recent quote for this trade" operator; Spark has no built-in).
  *
  * Spark-first composition instead of a join: UNION the two sides with
  * a side tag, then one window per key ordered by (ts, side) carrying
  * the running `last(right payload, ignoreNulls)` — left rows read the
  * latest right payload at or before their timestamp. Cost is ONE hash
  * shuffle on the key plus the per-partition sort the window needs;
  * compare a naive `left.join(right, key && rightTs <= leftTs)` +
  * argmax, which materializes every (left, right-before-it) pair —
  * quadratic per hot key. Equal timestamps: right rows sort BEFORE left
  * rows (side 0 < 1), so a right row at exactly `leftTs` matches —
  * the `<=` convention, same as DuckDB/Pandas as-of joins.
  *
  * At 100 TB the shape holds: both sides hash-partition by key, the
  * window is a sorted scan per partition carrying one payload of
  * state, and AQE's skew split handles hot keys. A left row with no
  * prior right row keeps a NULL payload (left-outer semantics).
  *
  * Determinism caveat: if the RIGHT side has duplicate (key, ts) rows
  * the winner among them is sort-order-dependent — pass `tieBreak` to
  * order equal-ts right rows (ascending; the LAST wins, e.g. a
  * sequence number picks the highest).
  */
object AsofJoin {

  /** Latest right row with `rightTs <= leftTs` (the `<=` convention).
    *
    * @param leftCols     left columns to carry through (unprefixed)
    * @param rightPayload right columns to attach, as (src -> outName)
    * @param tieBreak     optional right-side column ordering equal-ts
    *                     right rows (ascending; last wins) */
  def backward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)],
      tieBreak: Option[String] = None): DataFrame =
    asof(left, right, key, ts, leftCols, rightPayload, tieBreak,
      lookBack = true)

  /** Forward as-of: the single EARLIEST right row with
    * `rightTs >= leftTs` on the same key (the "next quote after this
    * order" direction). Mirrored window: right rows sort AFTER left
    * rows at equal ts (so an exact-ts right row matches — the `>=`
    * convention) and the frame runs currentRow→unboundedFollowing
    * carrying `first(right, ignoreNulls)`. Same single-shuffle cost
    * and tie-break contract as [[backward]] except ties take the
    * FIRST equal-ts right row in `tieBreak` order (lowest wins). */
  def forward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)],
      tieBreak: Option[String] = None): DataFrame =
    asof(left, right, key, ts, leftCols, rightPayload, tieBreak,
      lookBack = false)

  /** [[backward]] on the NATIVE physical operator
    * ([[graft.plans.AsofJoinExec]]) instead of the union+window
    * composition: same semantics and oracle, but planned like a
    * sort-merge join (co-located hash exchanges + per-partition sorted
    * merge holding ONE candidate row of state). See the plan node's
    * scaladoc for the comparison. Duplicate right (key, ts) ties:
    * pre-sort the right side if a deterministic winner is needed.
    *
    * @param rightPayload right columns to attach, as (src -> outName) */
  def backwardNative(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)]): DataFrame =
    native(left, right, key, ts, leftCols, rightPayload, forward = false)

  /** [[forward]] on the native physical operator: for each left row
    * the single EARLIEST right row with `rightTs >= leftTs` on the
    * same key. Same planning shape as [[backwardNative]]; the merge
    * holds no candidate state at all — the match is the un-consumed
    * head of the right iterator. Duplicate right (key, ts) ties take
    * the physically-FIRST row in sort order (mirror of backward's
    * last): pre-sort the right side for a deterministic winner. */
  def forwardNative(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)]): DataFrame =
    native(left, right, key, ts, leftCols, rightPayload, forward = true)

  private def native(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)],
      forward: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    graft.plans.AsofJoinStrategyRegistration.ensure(spark)
    val lp = left.queryExecution.analyzed
    // Self-join hygiene the analyzer would normally do for us
    // (DeduplicateRelations runs on built-in Joins, not hand-spliced
    // nodes): when both sides derive from one DataFrame they SHARE
    // exprIds, and downstream column pruning then satisfies every
    // "right" reference from the left child and prunes the right
    // subtree to an empty schema. Re-alias the right output with fresh
    // exprIds whenever the two outputs intersect.
    val rpRaw = right.queryExecution.analyzed
    val rp =
      if (lp.outputSet.intersect(rpRaw.outputSet).isEmpty) rpRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rpRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rpRaw)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of: no column $n in ${p.output.map(_.name)}"))
    val join = graft.plans.AsofJoinPlan(lp, rp,
      Seq(attr(lp, key)), Seq(attr(rp, key)), attr(lp, ts), attr(rp, ts),
      forward)
    val projected = Project(
      leftCols.map(c => attr(lp, c)) ++
        rightPayload.map { case (src, out) =>
          Alias(attr(rp, src).withNullability(true), out)()
        },
      join)
    SqlShims.ofRows(spark, projected)
  }

  private def asof(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String],
      rightPayload: Seq[(String, String)],
      tieBreak: Option[String],
      lookBack: Boolean): DataFrame = {
    val tb: Column = tieBreak.map(col).getOrElse(lit(0L))
    val rPrep = right.select(col(key), col(ts), tb.cast("long").as("__tb"),
      struct(rightPayload.map { case (src, out) => col(src).as(out) }: _*).as("__r"))
    val lPrep = left.select(col(key), col(ts),
      struct(leftCols.map(col): _*).as("__l"))
    val rType = rPrep.schema("__r").dataType
    val lType = lPrep.schema("__l").dataType
    val l = lPrep.select(col(key), col(ts), lit(1).as("__side"),
      lit(0L).as("__tb"), col("__l"), lit(null).cast(rType).as("__r"))
    val r = rPrep.select(col(key), col(ts), lit(0).as("__side"),
      col("__tb"), lit(null).cast(lType).as("__l"), col("__r"))
    // backward: right(0) sorts BEFORE left(1) at equal ts, running
    // frame looks back, last() wins. forward: mirror everything.
    val w =
      if (lookBack) Window.partitionBy(key)
        .orderBy(asc(ts), asc("__side"), asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else Window.partitionBy(key)
        .orderBy(asc(ts), desc("__side"), asc("__tb"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pick =
      if (lookBack) last(col("__r"), ignoreNulls = true).over(w)
      else first(col("__r"), ignoreNulls = true).over(w)
    l.unionByName(r)
      .withColumn("__asof", pick)
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map { case (_, out) => col(s"__asof.$out").as(out) }: _*)
  }
}
