package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation suite (the Deequ/great-expectations
  * shape): a set of constraints over a table, compiled into the fewest
  * possible distributed passes and emitted as a per-constraint report
  * `(check_name, violations, passed)`.
  *
  * Scale design — the whole point of declaring checks instead of
  * running them ad hoc:
  *  - ALL row-local checks (null / range / set / arbitrary predicate)
  *    compile into ONE aggregate over ONE scan, however many there are:
  *    each is a `sum(when(violation, 1))` column in the same
  *    `df.agg(...)`. At 100 TB the table is read once, not once per
  *    check.
  *  - uniqueness checks ride the same aggregate as exact
  *    `count distinct` columns. Spark plans multi-distinct aggregates
  *    with one Expand (data × (1 + #distinct-cols)) — still one scan of
  *    the source, and partial aggregation collapses each key on the map
  *    side before the shuffle.
  *  - referential checks are LEFT ANTI joins (null-safe: a null FK is
  *    counted by its own not-null check, not as a missing parent),
  *    one per referenced dimension — the dimension is the build side
  *    and broadcasts when small, exactly like the production FK check
  *    against a dim table.
  *
  * The report is tiny (one row per constraint) by construction; the
  * single wide aggregate row is exploded to rows with one
  * `explode(array(struct...))` projection, never a driver loop.
  */
object Validation {

  /** A row-local constraint: `violation` is a Column predicate that is
    * true on rows VIOLATING the constraint. Null semantics are the
    * caller's: wrap with `coalesce`/`isNull` as appropriate. */
  final case class RowCheck(name: String, violation: Column)

  def notNull(c: String): RowCheck =
    RowCheck(s"not_null:$c", col(c).isNull)

  /** Closed range [lo, hi]; nulls are NOT violations here (pair with
    * [[notNull]] to also forbid them — each failure then counts once
    * per constraint it breaks, the Deequ convention). */
  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    RowCheck(s"range:$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def inSet(c: String, values: Seq[String]): RowCheck =
    RowCheck(s"set:$c", col(c).isNotNull && !col(c).isin(values: _*))

  /** Uniqueness of a column: violations = n_rows − n_distinct (the
    * number of surplus rows occupying an already-taken key). */
  final case class UniqueCheck(column: String) {
    def name: String = s"unique:$column"
  }

  /** Referential-integrity check: every non-null `column` value must
    * exist in `ref(refColumn)`. */
  final case class FkCheck(column: String, ref: DataFrame, refColumn: String) {
    def name: String = s"fk:$column"
  }

  /** Run the suite; returns `(check_name, violations, passed)` ordered
    * by check name. One scan of `df` for all row + unique checks, plus
    * one anti-join per FK check. */
  def validate(
      df: DataFrame,
      rowChecks: Seq[RowCheck],
      uniqueChecks: Seq[UniqueCheck] = Nil,
      fkChecks: Seq[FkCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty || fkChecks.nonEmpty,
      "empty validation suite")
    val names = (rowChecks.map(_.name) ++ uniqueChecks.map(_.name) ++
      fkChecks.map(_.name))
    require(names.distinct.size == names.size, s"duplicate check names: $names")

    val rowAggs = rowChecks.map(rc =>
      sum(when(rc.violation, lit(1L)).otherwise(lit(0L))).as(rc.name))
    val uniqueAggs = uniqueChecks.flatMap(uc => Seq(
      count(col(uc.column)).as(s"__n:${uc.column}"),
      countDistinct(col(uc.column)).as(s"__d:${uc.column}")))
    val aggs = rowAggs ++ uniqueAggs

    val reportParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (aggs.nonEmpty) {
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val entries =
        rowChecks.map(rc =>
          struct(lit(rc.name).as("check_name"),
            coalesce(col(s"`${rc.name}`"), lit(0L)).as("violations"))) ++
        uniqueChecks.map(uc =>
          struct(lit(uc.name).as("check_name"),
            (col(s"`__n:${uc.column}`") - col(s"`__d:${uc.column}`"))
              .as("violations")))
      reportParts += wide
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.check_name"), col("e.violations"))
    }
    fkChecks.foreach { fk =>
      val orphans = df.filter(col(fk.column).isNotNull)
        .join(fk.ref.select(col(fk.refColumn).as(fk.column)),
          Seq(fk.column), "left_anti")
      reportParts += orphans.agg(count(lit(1)).as("violations"))
        .select(lit(fk.name).as("check_name"), col("violations"))
    }

    reportParts.reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")
  }
}
