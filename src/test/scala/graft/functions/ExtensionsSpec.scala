package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

/** [[GraftExtensions]]: the `spark.sql.extensions` config path must hand
  * a SQL-only session the native functions AND the optimizer-stage
  * cartesian guard — exercised on a real second session sharing the
  * test SparkContext (which is exactly how extensions load on a
  * cluster: per-session, from config, no Scala call sites). */
class ExtensionsSpec extends SparkSpec {

  /** A session with [[GraftExtensions]] applied. On a cluster the class
    * is named in `spark.sql.extensions`; here the SparkContext already
    * exists (that config is STATIC — read from the context's conf, so a
    * shared-context test can't exercise the string), so the spec goes
    * through `Builder.withExtensions`, which feeds the exact same
    * `applyExtensions` path the config string does. Restores the shared
    * default/active session after `body`. */
  private def withExtendedSession[A](body: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s ne base, "expected a fresh session for the extension test")
      body(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("config-injected SQL functions work with no registration call") {
    withExtendedSession { s =>
      val row = s.sql(
        "SELECT pattern_mask('Ábc 42/x') AS m, " +
          "double_render_length(CAST(0.0 AS DOUBLE)) AS l")
        .collect().head
      assert(row.getString(0) == PatternMask.mask("Ábc 42/x"))
      assert(row.getString(0) == "Aaab##/a")
      assert(row.getInt(1) == 3) // "0.0"
    }
  }

  test("cartesian guard rejects unconditioned joins before execution") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT * FROM range(10) a JOIN range(10) b").collect()
      }
      assert(e.getMessage.contains("cartesian"))
      // CROSS JOIN spelled out is rejected the same way
      val e2 = intercept[Exception] {
        s.sql("SELECT * FROM range(10) a CROSS JOIN range(10) b").collect()
      }
      assert(e2.getMessage.contains("cartesian"))
    }
  }

  test("guard allows equi-joins, scalar sides, and the opt-in conf") {
    withExtendedSession { s =>
      // plain equi-join: untouched
      assert(s.sql(
        "SELECT count(*) FROM range(10) a JOIN range(10) b ON a.id = b.id")
        .collect().head.getLong(0) == 10L)
      // scalar side (global aggregate, maxRows == 1): the legitimate
      // broadcast-a-scalar-to-every-row pattern must keep working
      assert(s.sql(
        """SELECT count(*) FROM range(10) a
          |JOIN (SELECT max(id) AS m FROM range(5)) s""".stripMargin)
        .collect().head.getLong(0) == 10L)
      // explicit opt-in unlocks a true cartesian
      s.conf.set(GraftExtensions.AllowCartesianKey, "true")
      try assert(s.sql("SELECT count(*) FROM range(10) a JOIN range(10) b")
        .collect().head.getLong(0) == 100L)
      finally s.conf.unset(GraftExtensions.AllowCartesianKey)
    }
  }

  test("guard allows equi-joins written as comma syntax or join-then-where") {
    withExtendedSession { s =>
      // comma-syntax SQL analyzes to Filter over Join(Inner, None) —
      // the join condition only appears in the WHERE clause until the
      // optimizer pushes it down. The guard runs post-pushdown, so it
      // sees the folded join condition, not the bare Join.
      assert(s.sql(
        "SELECT count(*) FROM range(10) a, range(10) b WHERE a.id = b.id")
        .collect().head.getLong(0) == 10L)
      // three-way comma join: the INNER Join(a, b) is conditioned by a
      // WHERE conjunct two levels up
      assert(s.sql(
        """SELECT count(*) FROM range(10) a, range(10) b, range(10) c
          |WHERE a.id = b.id AND b.id = c.id""".stripMargin)
        .collect().head.getLong(0) == 10L)
      // DataFrame join-then-where — same analyzed shape as comma syntax
      val a = s.range(10).toDF("x")
      val b = s.range(10).toDF("y")
      assert(a.join(b).where(org.apache.spark.sql.functions.col("x") ===
        org.apache.spark.sql.functions.col("y")).count() == 10L)
      // but a WHERE that touches only ONE side does not condition the
      // join — still a cartesian, still rejected
      val e = intercept[Exception] {
        s.sql("SELECT count(*) FROM range(10) a, range(10) b WHERE a.id > 3")
          .collect()
      }
      assert(e.getMessage.contains("cartesian"))
    }
  }

  test("sessions without the extension are unaffected") {
    // the shared test session has no check rule: cartesians still run
    assert(spark.sql("SELECT count(*) FROM range(3) a JOIN range(3) b")
      .collect().head.getLong(0) == 9L)
  }
}
