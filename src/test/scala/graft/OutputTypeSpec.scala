package graft

import org.apache.spark.sql.types._

/** Output-type contract sweep — makes the round-7 red class (six
  * queries hash-red on bit-identical VALUES, purely because Spark
  * rendered DECIMAL(30,9)/HUGEINT-adjacent types where the DuckDB
  * oracle yields DOUBLE/BIGINT) structurally impossible: every
  * `SparkEntry.queries` output column must use the canonical output
  * vocabulary the oracle compare is known to hash-match —
  * BIGINT / DOUBLE / STRING / BOOLEAN (+ INT where both engines agree,
  * BINARY, DATE/TIMESTAMP, and arrays/structs thereof). DecimalType in
  * particular is banned outright: a decimal literal (`/ 1000000.0`)
  * silently turns a whole column DECIMAL and fails the gate with
  * values bit-identical (SURVEY §8 output-type convention). */
class OutputTypeSpec extends SparkSpec {

  private val allowedAtomic: Set[DataType] = Set(
    LongType, DoubleType, StringType, BooleanType, IntegerType,
    BinaryType, DateType, TimestampType, TimestampNTZType)

  private def offending(dt: DataType, path: String): Seq[String] = dt match {
    case s: StructType =>
      s.fields.toSeq.flatMap(f => offending(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => offending(a.elementType, s"$path[]")
    case m: MapType =>
      offending(m.keyType, s"$path<key>") ++ offending(m.valueType, s"$path<val>")
    case d: DecimalType => Seq(s"$path: $d (DECIMAL is banned in outputs)")
    case t if allowedAtomic.contains(t) => Nil
    case t => Seq(s"$path: $t (outside the canonical output vocabulary)")
  }

  test("every query's output schema uses only canonical output types") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val errs =
        try offending(fn(spark, sfDir).schema, name)
        catch { case e: Throwable => Seq(s"$name: failed to build: ${e.getMessage}") }
      errs
    }
    assert(bad.isEmpty, "non-canonical output types:\n" + bad.mkString("\n"))
  }
}
