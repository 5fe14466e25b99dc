package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiRedactionSpec extends SparkSpec {

  private def one(text: String): (Int, Int, Int, Int, String, Int) = {
    val s = spark
    import s.implicits._
    val r = Seq(text).toDF("t").select(
      PiiRedaction.piiCount(col("t"), "email").as("e"),
      PiiRedaction.piiCount(col("t"), "phone").as("p"),
      PiiRedaction.piiCount(col("t"), "ip").as("i"),
      PiiRedaction.piiCount(col("t"), "national_id").as("n"),
      PiiRedaction.redact(col("t")).as("red"))
      .withColumn("resid", PiiRedaction.residual(col("red")))
      .collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getInt(5))
  }

  test("detects and redacts each kind; placeholders land in place") {
    val (e, p, i, n, red, resid) = one(
      "mail a.b+c@ex-site.org or x@y.io call 555-123-4567 " +
        "host 10.0.0.1 id 123-45-6789 done")
    assert((e, p, i, n) == (2, 1, 1, 1))
    assert(red == "mail [EMAIL] or [EMAIL] call [PHONE] host [IP] id [ID] done")
    assert(resid == 0)
  }

  test("kinds are mutually exclusive on each other's shapes") {
    // ssn shape is not a phone; ip octets are not phones/ids; an email
    // containing digits trips nothing else
    val (e, p, i, n, _, _) = one("123-45-6789 10.123.0.45 user42@example.com")
    assert((e, p, i, n) == (1, 0, 1, 1))
  }

  test("clean text is untouched and redaction is idempotent") {
    val (e, p, i, n, red, _) = one("just words and 12 plain numbers 345")
    assert((e, p, i, n) == (0, 0, 0, 0))
    assert(red == "just words and 12 plain numbers 345")
    val (_, _, _, _, red2, resid2) = one(red)
    assert(red2 == red && resid2 == 0)
  }

  test("redaction order prevents partial overlaps leaving residue") {
    // a phone-shaped string glued to an ip; whatever matches first, the
    // residual audit must end at zero
    val (_, _, _, _, red, resid) = one("x 555-123-4567 10.1.2.3 555.123.4567 y")
    assert(resid == 0, red)
  }

  test("the whole scrub plans as codegen regex — no UDF") {
    val s = spark
    import s.implicits._
    val plan = Seq("a").toDF("t")
      .select(PiiRedaction.redact(col("t")).as("r"),
        PiiRedaction.residual(PiiRedaction.redact(col("t"))).as("n"))
      .queryExecution.executedPlan.toString
    Seq("ScalaUDF", "BatchEvalPython").foreach { bad =>
      assert(!plan.contains(bad), plan)
    }
  }
}
