package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[AsofJoin.backwardNative]] (custom logical node + strategy +
  * physical exec) vs [[AsofJoin.backward]] (union + window): identical
  * semantics, engine-grade plan. */
class AsofNativeSpec extends SparkSpec {

  private def events = graft.queries.QueryUtil.eventsTsUs(spark, sfDir)

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

  test("forward native equals the union+window composition on real data") {
    val fPayload = Seq("ts_us" -> "next_click_ts_us", "value" -> "next_click_value")
    val native = AsofJoin.forwardNative(
      purchases, clicks, "user_id", "ts_us", leftCols, fPayload)
    val window = AsofJoin.forward(
      purchases, clicks, "user_id", "ts_us", leftCols, fPayload)
    val n = native.orderBy("user_id", "ts_us").collect().toSeq
    val w = window.orderBy("user_id", "ts_us").collect().toSeq
    assert(n.nonEmpty && n == w, s"native ${n.size} rows vs window ${w.size}")
    assert(n.exists(_.isNullAt(4)), "expected at least one unmatched left row")
  }

  test("forward hand-built corpus: >= convention, first wins, unmatched") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 9L, "c"), (3L, 5L, "d"))
      .toDF("k", "t", "tag")
    // k=1 has a right row exactly AT t=10 (matches, >= convention) and
    // two candidates after t=20 (the earliest, 25, must win);
    // k=2's only right row is before the left row -> null;
    // k=3 absent on the right -> null
    val r = Seq((1L, 10L, 100.0), (1L, 25L, 250.0), (1L, 30L, 300.0),
        (2L, 6L, 60.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.forwardNative(l, r, "k", "t",
        Seq("k", "t", "tag"), Seq("t" -> "rt", "v" -> "rv"))
      .orderBy("k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, "a", 10L, 100.0),  // exact-ts right row matches (>=)
      (1L, 20L, "b", 25L, 250.0),  // earliest at-or-after wins
      (2L, 9L, "c", -1L, -1.0),    // right exists but only earlier -> null
      (3L, 5L, "d", -1L, -1.0)))   // key absent on the right -> null
  }

  test("forward: one right row serves many left rows (head not consumed)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7.0)).toDF("k", "t", "v")
    val out = AsofJoin.forwardNative(l, r, "k", "t",
        Seq("k", "t", "tag"), Seq("v" -> "rv"))
      .orderBy("t").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(7.0, 7.0, 7.0))
  }

  test("NULL keys and timestamps: SQL equality semantics, both directions") {
    val s = spark
    import s.implicits._
    // left: null key (x), null time (y), and a live row (a) per key 1;
    // right: null-key and null-time rows that must NEVER match, plus
    // one live candidate on each side of t=10
    val l = Seq(
        (Option(1L), Option(10L), "a"),
        (Option.empty[Long], Option(10L), "x"),
        (Option(1L), Option.empty[Long], "y"))
      .toDF("k", "t", "tag")
    val r = Seq(
        (Option(1L), Option(5L), 50.0),
        (Option(1L), Option(15L), 150.0),
        (Option.empty[Long], Option(4L), 999.0),   // null key: skipped
        (Option(1L), Option.empty[Long], 888.0))   // null time: skipped
      .toDF("k", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getString(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3))).toSet
    val back = run(AsofJoin.backwardNative(l, r, "k", "t",
      Seq("k", "t", "tag"), Seq("v" -> "rv")))
    assert(back == Set(("a", 50.0), ("x", -1.0), ("y", -1.0)),
      s"backward null semantics drifted: $back")
    val fwd = run(AsofJoin.forwardNative(l, r, "k", "t",
      Seq("k", "t", "tag"), Seq("v" -> "rv")))
    assert(fwd == Set(("a", 150.0), ("x", -1.0), ("y", -1.0)),
      s"forward null semantics drifted: $fwd")
  }

  test("AQE with forced coalescing + skew thresholds: co-partitioning holds") {
    // AsofJoinExec requires equal child partition counts at runtime (a
    // loud `require`); this pins that AQE's partition coalescing never
    // coalesces the two child exchanges differently (same confs as
    // AqeSkewSpec, one hot key so sizes are skewed). Run on an isolated
    // session so the thresholds don't leak into other suites.
    val s2 = spark.newSession()
    graft.plans.AsofJoinStrategyRegistration.ensure(s2)
    import s2.implicits._
    Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s2.conf.set(k, v) }
    // hot key 1 on the left (byte-heavy), spread keys on the right:
    // the two exchanges carry very different byte sizes, so a per-side
    // coalesce decision would produce mismatched partition counts
    val l = (1 to 20000).map(i =>
        (if (i % 100 == 0) (i % 500).toLong else 1L, i.toLong, "x" * 64))
      .toDF("k", "t", "pad")
    val r = (1L to 500L).flatMap(k => Seq((k, 1L, k * 1.0), (k, 9L, k * 2.0)))
      .toDF("k", "t", "v")
    val out = AsofJoin.backwardNative(l, r, "k", "t",
      Seq("k", "t"), Seq("v" -> "rv"))
    val got = out.collect()
    assert(got.length == 20000)
    // spot-check semantics under AQE: hot key rows (t >= 9) see v=2.0
    val hot = got.filter(x => x.getLong(0) == 1L && x.getLong(1) >= 9L)
    assert(hot.nonEmpty && hot.forall(_.getDouble(2) == 2.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(plan.contains("AdaptiveSparkPlan"), plan)
  }
}
