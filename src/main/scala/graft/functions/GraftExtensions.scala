package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

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
  *  2. '''A cartesian-product guard''' — at 100 TB an accidental
  *     unconditioned join is a cluster-killer that Spark accepts
  *     silently (`spark.sql.crossJoin.enabled` defaults to true since
  *     3.0). The guard is an OPTIMIZER-stage rule, not an analysis-time
  *     check rule, for a structural reason: Datasets are analyzed
  *     eagerly, so `df.join(df2)` alone produces an analyzed
  *     `Join(Inner, None)` *before* a later `.where(...)` can attach the
  *     condition — an analysis-time check cannot tell that intermediate
  *     apart from a real cartesian. The optimizer only runs when an
  *     action executes the FINAL plan, after `PushPredicateThroughJoin`
  *     has folded WHERE-clause equi-predicates into the join condition
  *     (user-injected optimizer rules are appended after the built-in
  *     operator-optimization rules of the same batch) — so comma-syntax
  *     SQL, `join(...).where(...)`, and three-way comma joins all look
  *     conditioned by the time the guard sees them, while a filter that
  *     touches only one side has been pushed BELOW the join, correctly
  *     leaving it bare. Plans a session never executes are never
  *     rejected; `df.explain()` of a true cartesian fails fast, before
  *     any job runs. Escapes: a provably ≤1-row side
  *     (`LogicalPlan.maxRows` — the legitimate broadcast-a-scalar
  *     pattern) or `SET graft.plan.allowCartesian=true`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(session => new Rule[LogicalPlan] {
      override val ruleName = "graft.NoCartesianProduct"
      override def apply(plan: LogicalPlan): LogicalPlan = {
        GraftExtensions.checkNoCartesian(
          plan,
          allow = session.conf.getOption(GraftExtensions.AllowCartesianKey)
            .exists(_.equalsIgnoreCase("true")))
        plan
      }
    })
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

  /** Runs on the OPTIMIZED plan (see the class doc for why analysis
    * time is structurally too early). A join is conditioned iff some
    * conjunct of its own condition references both children — the same
    * bar Spark's `CheckCartesianProducts` applies when
    * `spark.sql.crossJoin.enabled` is false. A condition touching only
    * one side (`a.join(b, a.x > 1)`) is still a filtered cartesian and
    * is rejected. Throws on the first offender; returns silently on
    * clean plans. */
  private[functions] def checkNoCartesian(plan: LogicalPlan, allow: Boolean): Unit = {
    if (allow) return
    plan.foreach {
      case j @ Join(left, right, Inner | Cross, cond, _) =>
        val conditioned = cond.toSeq.flatMap(conjuncts).exists { c =>
          c.references.intersect(left.outputSet).nonEmpty &&
            c.references.intersect(right.outputSet).nonEmpty
        }
        if (!conditioned && !scalarSide(left) && !scalarSide(right))
          throw new IllegalStateException(
            s"[graft] unconditioned ${j.joinType} join (cartesian product) " +
              s"rejected before execution: neither side is provably <= 1 row. " +
              s"Add a join condition, or SET $AllowCartesianKey=true to opt in.")
      case _ => ()
    }
  }
}
