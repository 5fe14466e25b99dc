package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValidationSpec extends SparkSpec {

  // id dup (5 appears twice); v: null + out-of-range 99.0; s: null + bad "x";
  // fk: null + orphan 42
  private def crafted = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1.0: java.lang.Double, "a": String, 10L: java.lang.Long),
      (2L, 5.0: java.lang.Double, "b": String, 10L: java.lang.Long),
      (3L, null.asInstanceOf[java.lang.Double], "a": String, 20L: java.lang.Long),
      (4L, 99.0: java.lang.Double, null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]),
      (5L, 2.0: java.lang.Double, "x": String, 42L: java.lang.Long),
      (5L, 3.0: java.lang.Double, "b": String, 20L: java.lang.Long)
    ).toDF("id", "v", "s", "fk")
  }

  private def dim = {
    val s = spark
    import s.implicits._
    Seq(10L, 20L).toDF("k")
  }

  test("each check type counts exactly its own violations") {
    val rep = Validation.validate(crafted,
        rowChecks = Seq(
          Validation.notNull("v"),
          Validation.inRange("v", 0.0, 10.0),
          Validation.inSet("s", Seq("a", "b"))),
        uniqueChecks = Seq(Validation.UniqueCheck("id")),
        fkChecks = Seq(Validation.FkCheck("fk", dim, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("not_null:v") == (1L, false))       // one null v
    assert(rep("range:v") == (1L, false))          // 99.0 only; null NOT counted
    assert(rep("set:s") == (1L, false))            // "x" only; null NOT counted
    assert(rep("unique:id") == (1L, false))        // 5 occupies one surplus row
    assert(rep("fk:fk") == (1L, false))            // orphan 42; null NOT counted
    assert(rep.size == 5)
  }

  test("a clean table passes every check") {
    val rep = Validation.validate(crafted.filter(col("id") <= 2),
        rowChecks = Seq(Validation.notNull("v"),
          Validation.inRange("v", 0.0, 10.0)),
        uniqueChecks = Seq(Validation.UniqueCheck("id")),
        fkChecks = Seq(Validation.FkCheck("fk", dim, "k")))
      .collect()
    assert(rep.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("row + unique checks compile to ONE scan of the table") {
    val dir = java.nio.file.Files.createTempDirectory("valscan").toString
    crafted.write.mode("overwrite").parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    val rep = Validation.validate(t,
      rowChecks = Seq(Validation.notNull("v"),
        Validation.inRange("v", 0.0, 10.0),
        Validation.inSet("s", Seq("a", "b"))),
      uniqueChecks = Seq(Validation.UniqueCheck("id")))
    rep.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // scans in the final plan section only
    val p = rep.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet|FileScan".r.findAllIn(p).size == 1,
      s"expected 1 scan:\n$p")
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException] {
      Validation.validate(crafted,
        rowChecks = Seq(Validation.notNull("v"), Validation.notNull("v")))
    }
    intercept[IllegalArgumentException] {
      Validation.validate(crafted, rowChecks = Nil)
    }
  }
}
