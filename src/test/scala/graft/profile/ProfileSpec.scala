package graft.profile

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Whole-table profiler vs hand-checkable data + reference-parity
  * fixture (the demo generator from jar/ProfileJob.java:44-65). */
class ProfileSpec extends SparkSpec {

  /** The reference's demo generator, reproduced exactly:
    * every 3rd row (true,"3",1); else every 7th (true,"7",1); else every
    * 11th (null,"ABCDEF00X30A333Y",i); else (true, ""+i, i). i in 1..n.
    * (i%3 wins ties — see SURVEY.md §5.1.) */
  private def referenceRows(n: Int): Seq[(java.lang.Boolean, String, Integer)] =
    (1 to n).map { i =>
      if (i % 3 == 0) (java.lang.Boolean.TRUE, "3", Integer.valueOf(1))
      else if (i % 7 == 0) (java.lang.Boolean.TRUE, "7", Integer.valueOf(1))
      else if (i % 11 == 0) (null: java.lang.Boolean, "ABCDEF00X30A333Y", Integer.valueOf(i))
      else (java.lang.Boolean.TRUE, "" + i, Integer.valueOf(i))
    }

  test("reference demo fixture: profile matches directly-computed stats") {
    val s = spark
    import s.implicits._
    val n = 10000
    val rows = referenceRows(n)
    val df = rows.toDF("col1", "col2", "col3")
    val tp = ProfileRunner.profile(df)

    assert(tp.rowCount == n)
    val nulls1 = rows.count(_._1 == null)
    assert(tp.columns(0).nullValues == nulls1)
    // completeness: rows where col1 is null are incomplete, others complete
    assert(tp.completeRecords == n - nulls1)

    val c3 = tp.columns(2)
    val vals = rows.map(_._3.toDouble)
    assert(c3.moments.n == n)
    assert(math.abs(c3.moments.mean - vals.sum / n) < 1e-9 * vals.sum / n)
    assert(c3.moments.min == 1.0 && c3.moments.max == vals.max)

    val c2 = tp.columns(1)
    assert(c2.census.isDefined)
    val cs = c2.census.get
    // int census counts every parseable int (all except the marker string)
    assert(cs.intValues == rows.count(_._2 != "ABCDEF00X30A333Y"))
    assert(cs.dateValues == 0L)
    // boolean census counts only literal "true" (reference F5 quirk)
    assert(cs.booleanValues == 0L)

    // top values: "3" dominates (every 3rd row), then "7"
    assert(c2.topValues.head._1 == "3")
    assert(c2.topValues.head._2 == rows.count(_._2 == "3"))
  }

  test("single-pass plan: exactly one scan for the whole profile") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val aggCols = Seq(count(lit(1)).as("row_count")) ++
      df.schema.fields.zipWithIndex.flatMap { case (f, i) =>
        NumericProfiler.aggsFor(i, f)
      }
    val plan = df.agg(aggCols.head, aggCols.tail: _*)
      .queryExecution.executedPlan.toString
    val scans = "FileScan|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      "global aggregate should not hash-shuffle row data")
  }

  test("MomentsAggregator (udaf) agrees with built-in aggregates") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val viaAgg = df.agg(
      MomentsAggregator.asColumn(col("l_quantity").cast("double")).as("m"))
      .select("m.n", "m.mean", "m.var_pop", "m.skew_pop", "m.min", "m.max").head()
    val viaBuiltin = df.agg(
      count(col("l_quantity")), avg(col("l_quantity")),
      var_pop(col("l_quantity")), skewness(col("l_quantity")),
      min(col("l_quantity")).cast("double"), max(col("l_quantity")).cast("double")).head()
    assert(viaAgg.getLong(0) == viaBuiltin.getLong(0))
    assert(math.abs(viaAgg.getDouble(1) - viaBuiltin.getDouble(1)) < 1e-9)
    assert(math.abs(viaAgg.getDouble(2) - viaBuiltin.getDouble(2)) < 1e-6)
    assert(math.abs(viaAgg.getDouble(3) - viaBuiltin.getDouble(3)) < 1e-6)
    assert(viaAgg.getDouble(4) == viaBuiltin.getDouble(4))
    assert(viaAgg.getDouble(5) == viaBuiltin.getDouble(5))
  }

  test("value render parity quirks (CastUtils conventions)") {
    assert(ValueRender.doubleAsStr(0.0) == "0E0") // Calcite 0 -> "0E0"
    assert(ValueRender.lengthOf(java.lang.Boolean.TRUE) == 4)
    assert(ValueRender.lengthOf(java.lang.Boolean.FALSE) == 5)
    assert(ValueRender.lengthOf('x') == 1)
  }

  test("golden: rendered report on the reference demo fixture") {
    // SURVEY §5.2 item 4: the full rendered report (StatsPojo.toString,
    // StatsPojo.java:442-504, with the :449 numeric-values print bug
    // fixed — documented in ColumnProfile.report) is golden-filed so
    // any formatting or derived-stat drift is caught verbatim.
    // Regenerate deliberately with GRAFT_REGEN_GOLDEN=1 sbt test.
    val s = spark
    import s.implicits._
    val df = referenceRows(1000).toDF("col1", "col2", "col3")
    val got = ProfileRunner.report(df)
    val golden = java.nio.file.Paths.get("src/test/resources/reference_report.golden")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(golden.getParent)
      java.nio.file.Files.write(golden, got.getBytes("UTF-8"))
    }
    val want = new String(java.nio.file.Files.readAllBytes(golden), "UTF-8")
    assert(got == want, "rendered report drifted from golden file " +
      "(regenerate deliberately with GRAFT_REGEN_GOLDEN=1)")
  }

  test("scott bin width with skew correction (jar/ProfileJob.java:146-162)") {
    val m = Moments.of((1 to 1000).map(_.toDouble))
    val (w, reliable) = DerivedStats.scottBinWidth(m, 1000)
    assert(reliable)
    // symmetric data: plain scott rule, no correction
    val sigma = DerivedStats.stddevPop(m)
    assert(math.abs(w - math.floor(3.49 * sigma * math.pow(1000, -1.0 / 3))) < 1e-9)
  }
}
