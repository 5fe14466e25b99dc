package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[AsofJoin.backwardNative]] (custom logical node + strategy +
  * physical exec) vs [[AsofJoin.backward]] (union + window): identical
  * semantics, engine-grade plan. */
class AsofNativeSpec extends SparkSpec {

  private def events = spark.read
    .parquet(s"$sfDir/events.parquet")
    .withColumn("ts_us", expr("(ts - pmod(ts, 1000)) div 1000"))

  private def purchases = events.filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts_us"), col("event_id"),
      col("value").as("purchase_value"))

  private def clicks = events.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts_us"), col("value"))

  private val leftCols = Seq("user_id", "ts_us", "event_id", "purchase_value")
  private val payload = Seq("ts_us" -> "click_ts_us", "value" -> "click_value")

  test("native as-of equals the union+window composition on real data") {
    val native = AsofJoin.backwardNative(
      purchases, clicks, "user_id", "ts_us", leftCols, payload)
    val window = AsofJoin.backward(
      purchases, clicks, "user_id", "ts_us", leftCols, payload)
    val n = native.orderBy("user_id", "ts_us").collect().toSeq
    val w = window.orderBy("user_id", "ts_us").collect().toSeq
    assert(n.nonEmpty && n == w,
      s"native ${n.size} rows vs window ${w.size}")
    // left-outer: some purchase must predate every click for its user
    assert(n.exists(_.isNullAt(4)), "expected at least one unmatched left row")
  }

  test("hand-built corpus: <= convention, ties, unmatched, key isolation") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.backwardNative(l, r, "k", "t",
        Seq("k", "t", "tag"), Seq("t" -> "rt", "v" -> "rv"))
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, "a", 10L, 100.0),  // exact-ts right row matches (<=)
      (1L, 20L, "b", 15L, 150.0),  // latest at-or-before wins
      (2L, 5L, "c", -1L, -1.0),    // right exists but only later -> null
      (3L, 9L, "d", -1L, -1.0)))   // key absent on the right -> null
  }

  test("plans as the native exec: no window, co-located exchanges + sorts") {
    val plan = AsofJoin.backwardNative(
        purchases, clicks, "user_id", "ts_us", leftCols, payload)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }

  test("both sides derived from ONE DataFrame (shared exprIds) still work") {
    // the self-join shape: without fresh right-side exprIds, column
    // pruning satisfies right references from the left child and
    // prunes the right subtree to an empty schema (regression)
    val ev = events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("value").as("purchase_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value"))
    val out = AsofJoin.backwardNative(p, c, "user_id", "ts_us",
      Seq("user_id", "ts_us", "purchase_value"),
      Seq("value" -> "click_value"))
    val want = AsofJoin.backward(p, c, "user_id", "ts_us",
      Seq("user_id", "ts_us", "purchase_value"),
      Seq("value" -> "click_value"))
    assert(out.orderBy("user_id", "ts_us").collect().toSeq ==
      want.orderBy("user_id", "ts_us").collect().toSeq)
  }

  test("empty right side yields all-null payloads, not an error") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val out = AsofJoin.backwardNative(l, r, "k", "t",
      Seq("k", "t", "tag"), Seq("v" -> "rv")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }
}
