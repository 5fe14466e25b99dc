package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Evidence for the "AQE handles residual skew at runtime" claim the
  * scale notes lean on: with skew-join thresholds forced low, a join
  * against one hot key must come out of adaptive execution with its
  * skewed partition split (the SMJ prints `skew=true`). Design-time
  * salting (q45/q51) and AQE are complementary; this pins that the
  * runtime half actually engages. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // isolated SQLConf on the shared context: suites run concurrently,
    // and these thresholds must not leak into other suites' plans
    val s = spark.newSession()
    import s.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    // one hot key carrying ~all rows + a payload making it byte-heavy
    val fact = (1 to 40000).map(i =>
      (if (i % 100 == 0) i.toLong else 1L, "x" * 64)).toDF("k", "pad")
    val dim = (1L to 400L).map(k => (k, s"d$k")).toDF("dk", "dv")
    val joined = fact.join(dim.hint("merge"), col("k") === col("dk"))
    // 39600 hot-key rows match dk=1; of the 400 spread keys only
    // {100,200,300,400} exist in the dim. collect() (not count())
    // drives THIS Dataset's QueryExecution so the adaptive plan we
    // inspect below is the finalized one.
    val n = joined.collect().length
    assert(n == 39604, s"unexpected join cardinality $n")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the hot partition as skewed:\n$plan")
  }
}
