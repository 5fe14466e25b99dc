package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native expressions: SQL registration, codegen paths, and source
  * format round-trips (csv/json/parquet). */
class FunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like their Column forms") {
    GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sfDir/customer.parquet")
      .limit(50).createOrReplaceTempView("cust_v")
    val viaSql = spark.sql(
      "SELECT c_name, pattern_mask(c_name) AS m FROM cust_v ORDER BY c_name")
      .collect()
    viaSql.foreach { r =>
      assert(r.getString(1) == PatternMask.mask(r.getString(0)))
    }
    val cos = spark.sql(
      "SELECT double_array_cosine(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0 / math.sqrt(2)) < 1e-12)
    val ic = spark.sql(
      "SELECT sorted_long_intersect_count(array(1L,3L,5L), array(2L,3L,5L,9L)) AS n")
      .head().getInt(0)
    assert(ic == 2)
    val nfc = spark.sql("SELECT nfc_normalize('e\u0301') AS s").head().getString(0)
    assert(nfc == "\u00e9")
    val rl = spark.sql(
      "SELECT double_render_length(0.0d), float_render_length(2.5f), " +
        "decimal_render_length('0.5')").head()
    assert(rl.getInt(0) == 3) // "0E0"
    assert(rl.getInt(1) == graft.profile.ValueRender.floatAsStr(2.5f).length)
    assert(rl.getInt(2) == 2) // ".5"
  }

  test("pattern_mask works inside whole-stage codegen and interpreted eval") {
    val s = spark
    import s.implicits._
    val df = Seq("Abc-12", "café #9").toDF("s")
    // codegen path (projection)
    val gen = df.select(PatternMask.pattern_mask(col("s"))).collect().map(_.getString(0))
    assert(gen.toSeq == Seq("Aaa-##", "aaaab##"))
    // interpreted path (direct expression eval on a catalyst literal)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    assert(PatternMaskExpression(
      Literal(UTF8String.fromString("Abc-12"),
        org.apache.spark.sql.types.StringType)).eval(null).toString == "Aaa-##")
  }

  test("render_length matches the Calcite-parity renderers, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val doubles = Seq(0d, 1d, -1.5d, 1234.5678d, 1e-9d, -0.25d,
      Double.NaN, 123456789.123456789d)
    val got = doubles.toDF("d")
      .select(RenderLength.double_render_length(col("d"))).collect().map(_.getInt(0))
    assert(got.toSeq == doubles.map(d => graft.profile.ValueRender.doubleAsStr(d).length))
    val floats = Seq(0f, 2.5f, -3.25f, 1e8f, Float.NaN)
    val gotF = floats.toDF("f")
      .select(RenderLength.float_render_length(col("f"))).collect().map(_.getInt(0))
    assert(gotF.toSeq == floats.map(f => graft.profile.ValueRender.floatAsStr(f).length))
    val decs = Seq("0.5", "-0.25", "12.34", "3")
    val gotD = decs.toDF("x")
      .select(RenderLength.decimal_render_length(col("x"))).collect().map(_.getInt(0))
    assert(gotD.toSeq == decs.map(x => graft.profile.ValueRender
      .bigDecimalAsStr(new java.math.BigDecimal(x)).length))
    // interpreted path + null propagation (nullIntolerant)
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(RenderLengthExpression(Literal(0.0d), "double").eval() == 3) // "0E0"
    assert(RenderLengthExpression(
      Literal.create(null, org.apache.spark.sql.types.DoubleType), "double").eval() == null)
  }

  test("csv and json sources round-trip with schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val orig = spark.read.parquet(s"$sfDir/nation.parquet")
    orig.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    orig.write.mode("overwrite").json(s"$dir/nation_json")
    val csv = spark.read.option("header", "true")
      .schema(orig.schema).csv(s"$dir/nation_csv")
    val json = spark.read.schema(orig.schema).json(s"$dir/nation_json")
    val want = orig.orderBy("n_nationkey").collect().toSeq
    assert(csv.orderBy("n_nationkey").collect().toSeq == want)
    assert(json.orderBy("n_nationkey").collect().toSeq == want)
    // ORC ships in Spark core — columnar alternative with the same
    // pushdown/pruning surface as parquet
    orig.write.mode("overwrite").orc(s"$dir/nation_orc")
    val orc = spark.read.orc(s"$dir/nation_orc")
    assert(orc.orderBy("n_nationkey").collect().toSeq == want)
    assert(orc.schema == orig.schema)
  }

  test("nearest_cells picks top-p centroids by cosine, ties to lowest cell") {
    val s = spark
    import s.implicits._
    val cents = Array(
      Array(1.0, 0.0), // cell 0
      Array(0.0, 1.0), // cell 1
      Array(1.0, 1.0), // cell 2
      Array(1.0, 0.0)) // cell 3 — duplicate of 0: tie must resolve to 0 first
    val df = Seq(Seq(2.0, 0.0), Seq(1.0, 1.0)).toDF("v")
    val got = df.select(VectorOps.nearest_cells(col("v"), cents, 3)).collect()
      .map(_.getSeq[Int](0).toSeq)
    // v=(2,0): cos 1.0 with cells 0 and 3 (tie -> 0 then 3), then cell 2
    assert(got(0) == Seq(0, 3, 2), s"got ${got(0)}")
    // v=(1,1): cell 2 exact, then cells 0/1/3 all cos=.707 (tie -> 0, 1)
    assert(got(1) == Seq(2, 0, 1), s"got ${got(1)}")
    // interpreted eval path agrees with the codegen projection above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = Literal(new GenericArrayData(Array(2.0, 0.0)), ArrayType(DoubleType))
    val ev = NearestCells(lit, cents.map(_.toIndexedSeq).toIndexedSeq, 3)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(ev.toIntArray().toSeq == Seq(0, 3, 2))
  }

  test("sorted intersect agrees with array_intersect semantics") {
    val rnd = new scala.util.Random(7)
    val s = spark
    import s.implicits._
    val pairs = Seq.fill(50) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val got = pairs.toDF("a", "b").select(
      ArrayOps.sortedIntersectCount(col("a"), col("b")).as("n")).collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getInt(0) == a.toSet.intersect(b.toSet).size)
    }
  }

  test("nfc_normalize composes combining sequences, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val decomposed = "cafe\u0301 a\u0301 plain"
    val composed = "caf\u00e9 \u00e1 plain"
    val df = Seq(decomposed, composed, "pure ascii").toDF("s")
    val gen = df.select(Unicode.nfc_normalize(col("s"))).collect()
      .map(_.getString(0))
    assert(gen.toSeq == Seq(composed, composed, "pure ascii"))
    // idempotence + identity on already-normal input
    assert(Unicode.nfc(composed) == composed)
    assert(Unicode.nfc(Unicode.nfc(decomposed)) == Unicode.nfc(decomposed))
    // ASCII fast path returns the same reference (no allocation)
    val ascii = "nothing to do"
    assert(Unicode.nfc(ascii) eq ascii)
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    assert(NfcNormalizeExpression(
      Literal(UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType)).eval(null).toString == composed)
  }
}
