package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Cluster-wide wiring for the engine, the way a Spark deployment
  * actually enables a library: one line of config instead of per-session
  * registration calls —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * Injects two things into every session built from that config:
  *
  *  1. '''The native SQL functions''' ([[GraftFunctions.builders]]) — the
  *     same codegen expressions the DataFrame API uses, so a SQL-only
  *     user gets `pattern_mask(...)`, `double_array_cosine(...)`, … with
  *     no Scala call sites at all. (A `registerAll(spark)` path is kept
  *     in [[GraftFunctions]] for notebook sessions that already exist.)
  *
  *  2. '''A cartesian-product check rule''' — at 100 TB an accidental
  *     unconditioned join is a cluster-killer that Spark accepts
  *     silently (`spark.sql.crossJoin.enabled` defaults to true since
  *     3.0). The rule fails such plans at ANALYSIS time — before any
  *     job runs — unless either side is provably at most one row
  *     (`LogicalPlan.maxRows`, which covers the legitimate pattern of
  *     joining a global-aggregate scalar against every row) or the
  *     session opts in via `SET graft.plan.allowCartesian=true`.
  *     Analysis-time rejection is the cheapest possible guard: no
  *     strategy, no runtime check, no plan rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectCheckRule(session => plan => GraftExtensions.checkNoCartesian(
      plan,
      allow = session.conf.getOption(GraftExtensions.AllowCartesianKey)
        .exists(_.equalsIgnoreCase("true"))))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  val AllowCartesianKey = "graft.plan.allowCartesian"

  /** True iff this side of a join can never produce more than one row —
    * a global aggregate, `LIMIT 1`, a one-row `VALUES`, etc. Joining a
    * scalar against everything is a broadcast of one row, not a
    * cartesian blow-up, and every legitimate `crossJoin` in this
    * library has that shape. */
  private def scalarSide(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The check runs on the ANALYZED plan — before predicate pushdown —
    * so a standard equi-join spelled `FROM a, b WHERE a.x = b.x` (or
    * `df.join(df2).where(...)`) still looks like Filter-over-
    * Join(Inner, None). Spark's own CheckCartesianProducts avoids that
    * false positive by running after pushdown; here the same effect is
    * had by carrying ancestor Filter conjuncts down the walk: a join is
    * conditioned if any conjunct above it references both children
    * (exactly the predicates PushPredicateThroughJoin would turn into
    * the join condition). Conjuncts are keyed by expression id, so
    * re-aliasing projections between the filter and the join fall back
    * to rejection — conservative in the safe direction. */
  private[functions] def checkNoCartesian(plan: LogicalPlan, allow: Boolean): Unit = {
    def visit(p: LogicalPlan, above: Seq[Expression]): Unit = p match {
      case Filter(cond, child) => visit(child, above ++ conjuncts(cond))
      case j @ Join(left, right, Inner | Cross, cond, _) =>
        val conditioned = cond.isDefined || above.exists { c =>
          c.references.intersect(left.outputSet).nonEmpty &&
            c.references.intersect(right.outputSet).nonEmpty
        }
        if (!conditioned && !scalarSide(left) && !scalarSide(right))
          throw new IllegalStateException(
            s"[graft] unconditioned ${j.joinType} join (cartesian product) " +
              s"rejected at analysis time: neither side is provably <= 1 row. " +
              s"Add a join condition, or SET $AllowCartesianKey=true to opt in.")
        visit(left, above)
        visit(right, above)
      case other => other.children.foreach(visit(_, above))
    }
    if (!allow) visit(plan, Nil)
  }
}
