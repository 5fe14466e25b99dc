package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** General analytics surface: aggregation, joins, windows, quantiles,
  * distinct, histograms, event-time grouping. These exercise the Catalyst
  * paths a 100 TB deployment depends on: partial aggregation, broadcast
  * joins for dimensions, TakeOrderedAndProject for top-K, AQE.
  */
object AnalyticsQueries {

  // ---- q01: pricing summary (flagship; TPC-H Q1 shape) ---------------

  /** One scan + one partial/final hash aggregate over 6 groups. Money
    * sums go through exact integer cent arithmetic ([[QueryUtil.moneySum]])
    * so they are order-independent — bit-identical across engines and
    * partitionings. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= tsLit(li, "l_shipdate", "1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))
          * (lit(1d) + col("l_tax"))).as("sum_charge"),
        r6(avg(col("l_quantity"))).as("avg_qty"),
        r6(avg(col("l_extendedprice"))).as("avg_price"),
        r6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  (sum(floor(l_quantity * 100)::BIGINT)::DOUBLE / 100) AS sum_qty,
      |  (sum(floor(l_extendedprice * 100)::BIGINT)::DOUBLE / 100) AS sum_base_price,
      |  (sum(floor((l_extendedprice * (1 - l_discount)) * 100)::BIGINT)::DOUBLE / 100) AS sum_disc_price,
      |  (sum(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100)::BIGINT)::DOUBLE / 100) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q17: window functions -----------------------------------------

  /** Top-3 orders per customer by total price — ranking window. The
    * window partitions by o_custkey: at scale this is one shuffle keyed
    * by customer, no global sort. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.filter(col("o_custkey") < 200)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_custkey", "rk")
  }

  val topOrdersPerCustomerSql: String =
    """SELECT o_custkey, rk::INTEGER AS rk, o_orderkey, round(o_totalprice, 2) AS total_price
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders WHERE o_custkey < 200) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  // ---- q18: star-schema join with broadcast dimensions ---------------

  /** Revenue per nation: fact-to-fact shuffle join (orders ⋈ lineitem)
    * plus broadcast joins for the small dimensions — exactly the plan
    * shape wanted at 100 TB (dims broadcast, one big-key shuffle). */
  def revenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val revenuePerNationSql: String =
    """SELECT r_name, n_name,
      |  (sum(floor((l_extendedprice * (1 - l_discount)) * 100)::BIGINT)::DOUBLE / 100) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---- q19: event-time tumbling window aggregation -------------------

  /** Hourly per-type event rollup — the batch shape of the streaming
    * windowed profile (same plan Structured Streaming runs
    * incrementally). Window start exported as epoch seconds for an
    * engine-neutral hashable type. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    // Hour bucketing in exact integer math, dispatched on the fixture's
    // actual ts type (epoch-nanos long OR timestamp[us] —
    // QueryUtil.eventHourEpoch floors either to the hour).
    val ev = table(spark, dir, "events")
    ev.groupBy(
        eventHourEpoch(ev).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // mean via exact integer micro-units, not avg() over doubles:
        // 2-decimal value data makes exact means land on the .5e-6
        // half-up edge constantly, where float rounding is engine-
        // specific (QueryUtil.centMean6 scaladoc; measured at sf0.1
        // round 7: 1 row in 3600 flips)
        sum(floor(col("value") * lit(100d)).cast("long")).as("cents"))
      .select(col("hour_epoch"), col("event_type"), col("n_events"),
        centMean6("cents", "n_events").as("avg_value"),
        (col("cents").cast("double") / lit(100d)).as("sum_value"))
      .orderBy("hour_epoch", "event_type")
  }

  val eventsHourlySql: String =
    s"""SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
       |  event_type, count(*) AS n_events,
       |  ${centMean6Sql("sum(floor(value * 100)::BIGINT)", "count(*)")}
       |    AS avg_value,
       |  (sum(floor(value * 100)::BIGINT)::DOUBLE / 100) AS sum_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin

  // ---- q20: exact quartiles + IQR outliers ---------------------------

  /** Exact interpolated quartiles + Tukey-fence outlier count — the
    * reference's declared-TODO surface (jar/ProfileJob.java:68-70).
    * Runs the bounded-memory [[quartilesOutliersScalable]] plan: as of
    * round 5 no query in the surface executes `percentile`'s O(rows)
    * aggregation buffer (PlanSpec sweeps the whole surface for it).
    * The one-scan `percentile` variant survives as
    * [[quartilesOutliersOneScan]], a spec-side cross-check only. */
  def quartilesOutliers(spark: SparkSession, dir: String): DataFrame =
    quartilesOutliersScalable(spark, dir)

  /** SPEC-SIDE CROSS-CHECK ONLY (ExactQuantileSpec): the one-scan
    * `percentile` formulation q20 ran through round 4. Two-stage: tiny
    * quartile aggregate broadcast back over the scan.
    *
    * MEMORY BOUND: Spark's exact `percentile` buffers EVERY value of
    * the column in its aggregation buffer — O(rows) driver-side after
    * the final merge. Correct at test SF; unusable at 100 TB, which is
    * why the shipped q20 is [[quartilesOutliersScalable]]. */
  def quartilesOutliersOneScan(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val q = li.agg(
      expr("percentile(l_extendedprice, 0.25)").as("q1"),
      expr("percentile(l_extendedprice, 0.5)").as("q2"),
      expr("percentile(l_extendedprice, 0.75)").as("q3"))
    val out = li.crossJoin(broadcast(q))
      .filter(col("l_extendedprice") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
        col("l_extendedprice") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .agg(count(lit(1)).as("n_outliers"))
    q.crossJoin(out)
      .select(r6(col("q1")).as("q1"), r6(col("q2")).as("q2"),
        r6(col("q3")).as("q3"), col("n_outliers"))
  }

  val quartilesOutliersSql: String =
    """WITH q AS (
      |  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
      |         quantile_cont(l_extendedprice, 0.5) AS q2,
      |         quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem)
      |SELECT round(q1, 6) AS q1, round(q2, 6) AS q2, round(q3, 6) AS q3,
      |  (SELECT count(*) FROM lineitem, q
      |   WHERE l_extendedprice < q1 - 1.5 * (q3 - q1)
      |      OR l_extendedprice > q3 + 1.5 * (q3 - q1)) AS n_outliers
      |FROM q""".stripMargin

  /** Accuracy parameter for [[quartilesOutliersApprox]]: rank error
    * ≤ 1/accuracy of the row count (Greenwald–Khanna summaries). */
  val ApproxPercentileAccuracy = 10000

  /** q65 (and, since round 5, q20): the SCALE-TRUE exact quantile —
    * exact interpolated quartiles + Tukey outliers, computed by
    * [[graft.operators.ExactQuantile]] histogram refinement instead of
    * `percentile`'s O(rows) aggregation buffer: a handful of scans
    * with `buckets` counters per task and ≤ `collectMax` values ever
    * driver-side, so the same code holds at 10^12 rows where the
    * one-scan buffer dies. [[quartilesOutliersOneScan]] stays as the
    * spec-side `percentile` cross-check at test SF. */
  def quartilesOutliersScalable(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val qs = graft.operators.ExactQuantile.quantiles(
      li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    val (q1, q2, q3) = (qs(0), qs(1), qs(2))
    val iqr = q3 - q1
    li.filter(col("l_extendedprice") < lit(q1 - 1.5 * iqr) ||
        col("l_extendedprice") > lit(q3 + 1.5 * iqr))
      .agg(count(lit(1)).as("n_outliers"))
      .select(r6(lit(q1)).as("q1"), r6(lit(q2)).as("q2"),
        r6(lit(q3)).as("q3"), col("n_outliers"))
  }

  /** Same oracle as q20 — the operator must reproduce DuckDB
    * `quantile_cont` exactly. */
  val quartilesOutliersScalableSql: String = quartilesOutliersSql

  /** The Greenwald–Khanna sketch stage of q35, exposed for the spec:
    * one scan → three approximate quartile values (actual data
    * elements, rank within 1/accuracy of target). */
  def approxQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.agg(expr(
        s"approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), $ApproxPercentileAccuracy)")
        .as("qs"))
      .select(element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("q2"),
        element_at(col("qs"), 3).as("q3"))
  }

  /** Scale path for [[quartilesOutliers]]: `approx_percentile`
    * (Greenwald–Khanna quantile summaries) replaces exact `percentile`.
    * Per-buffer state is O(accuracy·log n) instead of O(rows), so the
    * same two-stage plan — tiny sketch aggregate broadcast back over a
    * second scan — survives any corpus size.
    *
    * The sketch's returned VALUES are engine-specific, so the output
    * carries the GK accuracy claim in hash-matchable form: the row
    * count plus one boolean per quartile asserting the returned
    * value's exact rank (count of values ≤ it, from the second scan)
    * is within eps·n+1 of the target rank p·n (eps = 1/accuracy; +1
    * for the floor/interpolation seam). Oracle = exact count + literal
    * TRUEs. QuantileSpec additionally asserts the Tukey-fence outlier
    * count from these quartiles matches the exact q20's at test SF. */
  def quartilesOutliersApprox(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val q = approxQuartiles(spark, dir)
    val eps = 1.0 / ApproxPercentileAccuracy
    val c = col("l_extendedprice")
    val ranks = li.crossJoin(broadcast(q)).agg(
      count(lit(1)).as("n"),
      sum(when(c <= col("q1"), 1L).otherwise(0L)).as("le1"),
      sum(when(c <= col("q2"), 1L).otherwise(0L)).as("le2"),
      sum(when(c <= col("q3"), 1L).otherwise(0L)).as("le3"))
    def ok(le: String, p: Double) =
      (abs(col(le).cast("double") - lit(p) * col("n").cast("double"))
        <= lit(eps) * col("n").cast("double") + lit(1.0))
    ranks.select(col("n"),
      ok("le1", 0.25).as("q1_ok"),
      ok("le2", 0.50).as("q2_ok"),
      ok("le3", 0.75).as("q3_ok"))
  }

  val quartilesOutliersApproxSql: String =
    """SELECT count(*) AS n,
      |  TRUE AS q1_ok, TRUE AS q2_ok, TRUE AS q3_ok
      |FROM lineitem""".stripMargin

  // ---- q37: sessionization (session windows) -------------------------

  val SessionGap = "12 hours"

  /** Per-user sessionization of the events table via `session_window`
    * (gap-merged event-time windows — a distinct window class from
    * q19's fixed tumbling hours). Events ≤ gap apart merge (boundary
    * pinned by experiment: an event exactly `gap` after the previous
    * MERGES; `gap`+ε starts a new session — the oracle's
    * `ts - prev > gap` reproduces exactly that).
    *
    * Scale shape: one hash-partition shuffle on user_id, then sessions
    * form per-key via sorted merge — no self-join, no window-function
    * second shuffle. The same expression runs incrementally under
    * Structured Streaming with a watermark (state = open sessions per
    * user, closed at watermark + gap). */
  def sessionization(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsEventTs(spark, dir)
    ev.groupBy(col("user_id"), session_window(col("event_ts"), SessionGap))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")
  }

  val sessionizationSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 12 HOUR
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts, value,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM m)
      |SELECT user_id,
      |  epoch_us(min(ts)::TIMESTAMP) AS session_start_us,
      |  count(*) AS n_events,
      |  (sum(floor(value * 100)::BIGINT)::DOUBLE / 100) AS sum_value
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_start_us""".stripMargin

  // ---- q38: backward as-of join --------------------------------------

  /** For each purchase event, the user's most recent click at or
    * before it ([[graft.operators.AsofJoin.backward]] — union + running
    * window, one shuffle; see its scaladoc for the 100 TB argument).
    * Timestamps as epoch micros (exact long floor from nanos) so both
    * engines compare integers. (user_id, ts) is unique in the events
    * data at every SF (probed), so no tie-break is needed; DuckDB's
    * native ASOF LEFT JOIN is the oracle. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTsUs(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value"))
    graft.operators.AsofJoin.backward(
        purchases, clicks,
        key = "user_id", ts = "ts_us",
        leftCols = Seq("user_id", "ts_us", "event_id", "purchase_value"),
        rightPayload = Seq("ts_us" -> "click_ts_us", "value" -> "click_value"))
      .withColumnRenamed("ts_us", "purchase_ts_us")
      .orderBy("user_id", "purchase_ts_us")
  }

  /** q38's as-of query on the NATIVE physical operator
    * ([[graft.plans.AsofJoinExec]]: custom logical node + strategy +
    * exec with SMJ-style requirements and an O(1)-state merge) instead
    * of the union+window composition. Same semantics, same DuckDB
    * `ASOF LEFT JOIN` oracle — the gate proves the engine operator
    * end-to-end on real data. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsTsUs(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value"))
    graft.operators.AsofJoin.backwardNative(
        purchases, clicks,
        key = "user_id", ts = "ts_us",
        leftCols = Seq("user_id", "ts_us", "event_id", "purchase_value"),
        rightPayload = Seq("ts_us" -> "click_ts_us", "value" -> "click_value"))
      .withColumnRenamed("ts_us", "purchase_ts_us")
      .orderBy("user_id", "purchase_ts_us")
  }

  val asofJoinSql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS purchase_ts_us,
      |         event_id, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS click_ts_us,
      |         value AS click_value
      |  FROM events WHERE event_type = 'click')
      |SELECT p.user_id AS user_id, p.purchase_ts_us, p.event_id,
      |       p.purchase_value, c.click_ts_us, c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.click_ts_us <= p.purchase_ts_us
      |ORDER BY user_id, purchase_ts_us""".stripMargin

  // ---- q21: exact + approximate distinct -----------------------------

  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.agg(
      countDistinct(col("l_partkey")).as("nd_part"),
      countDistinct(col("l_suppkey")).as("nd_supp"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("nd_flag_status"))
  }

  val distinctCountsSql: String =
    """SELECT count(DISTINCT l_partkey) AS nd_part,
      |  count(DISTINCT l_suppkey) AS nd_supp,
      |  count(DISTINCT (l_returnflag, l_linestatus)) AS nd_flag_status
      |FROM lineitem""".stripMargin

  /** Precision of the q22 sketches (HLL++ relativeSD) and the bound
    * the gate asserts: the bound is 3.3σ of the configured precision —
    * a deterministic-given-the-data claim with real margin, not a
    * lucky draw. (The library default rsd 0.05 breached a 2% bound at
    * sf0.01 — the bound must be derived from the precision, not
    * hoped.) */
  val ApproxDistinctRsd = 0.015
  val ApproxDistinctRelErr = 0.05

  /** HyperLogLog++ approximate distinct — the 100 TB path (single pass,
    * fixed memory, mergeable sketches). Sketch estimates are
    * engine-specific (DuckDB's HLL differs by construction), so the
    * raw estimates can't hash-match an oracle; instead the output
    * carries the accuracy CLAIM in hash-matchable form — the exact
    * distinct counts plus one boolean per column asserting the HLL
    * estimate landed within [[ApproxDistinctRelErr]] of exact. The
    * oracle recomputes the exact side and literal TRUE. The exact
    * countDistincts exist only to materialize the claim for the gate;
    * at 100 TB one ships the estimates alone. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    def ok(apx: String, nd: String) =
      (abs(col(apx).cast("double") - col(nd).cast("double"))
        <= lit(ApproxDistinctRelErr) * col(nd).cast("double"))
    li.agg(
      countDistinct(col("l_partkey")).as("nd_part"),
      countDistinct(col("l_suppkey")).as("nd_supp"),
      countDistinct(col("l_orderkey")).as("nd_order"),
      approx_count_distinct(col("l_partkey"), ApproxDistinctRsd).as("apx_part"),
      approx_count_distinct(col("l_suppkey"), ApproxDistinctRsd).as("apx_supp"),
      approx_count_distinct(col("l_orderkey"), ApproxDistinctRsd).as("apx_order"))
      .select(col("nd_part"), col("nd_supp"), col("nd_order"),
        ok("apx_part", "nd_part").as("part_ok"),
        ok("apx_supp", "nd_supp").as("supp_ok"),
        ok("apx_order", "nd_order").as("order_ok"))
  }

  val approxDistinctSql: String =
    """SELECT count(DISTINCT l_partkey) AS nd_part,
      |  count(DISTINCT l_suppkey) AS nd_supp,
      |  count(DISTINCT l_orderkey) AS nd_order,
      |  TRUE AS part_ok, TRUE AS supp_ok, TRUE AS order_ok
      |FROM lineitem""".stripMargin

  // ---- q326: KMV (k-minimum-values) distinct sketch -------------------

  val KmvK = 64

  /** Distinct counting via the KMV bottom-k sketch (Bar-Yossef et al.
    * 2002): keep the [[KmvK]] smallest 32-bit hash values per group;
    * the estimate `(k−1)·2³² div h_k` follows from the k-th minimum's
    * expected position. The family's third trade-off point: q21 exact
    * (state ∝ distinct), q22 HLL (KB state, engine-specific estimate
    * gated by an error BOUND), KMV (k words of state, estimate
    * DETERMINISTIC — the hash values come from the engine-shared md5
    * family, so unlike HLL the ESTIMATE ITSELF hash-matches
    * cross-engine and rides the gate exactly, err_pm and all). Also
    * the sketch behind distinct-intersection estimates (its bottom-k
    * sets are mergeable by union-then-truncate).
    *
    * Groups under k distinct hashes publish the exact count (the
    * sketch's own convention — the bottom-k set IS the value set) and
    * flag `exact_regime`. Scale shape: one distinct-hash aggregate
    * (map-side combined), a per-group bottom-k window over distinct
    * hashes, a one-row-per-group stitch. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hs = table(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(conv(substring(md5(concat(cast(user_id as string), " +
          "':kmv')), 1, 8), 16, 10) as bigint)").as("h"))
      .distinct()
    val nd = table(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("nd_users"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val kth = hs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === KmvK)
      .select(col("event_type"), col("h").as("hk"))
    nd.join(kth, Seq("event_type"), "left")
      .select(col("event_type"), col("nd_users"),
        when(col("hk").isNotNull,
          expr(s"(${KmvK - 1} * 4294967296) div hk"))
          .otherwise(col("nd_users")).as("est_kmv"),
        col("hk").isNull.as("exact_regime"))
      .withColumn("err_pm",
        expr("(1000 * abs(est_kmv - nd_users)) div nd_users"))
      .orderBy("event_type")
  }

  val kmvDistinctSql: String = {
    // 8 lowercase hex digits of md5 → 32-bit uint, digit-folded (no
    // engine hex-cast dialect in the way)
    val h32 = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
      .mkString(" + ")
    s"""WITH hs AS (
       |  SELECT DISTINCT event_type, ($h32)::BIGINT AS h FROM (
       |    SELECT DISTINCT event_type,
       |      md5(user_id::VARCHAR || ':kmv') AS m
       |    FROM events)),
       |nd AS (
       |  SELECT event_type, count(DISTINCT user_id)::BIGINT AS nd_users
       |  FROM events GROUP BY 1),
       |kth AS (
       |  SELECT event_type, h AS hk FROM (
       |    SELECT event_type, h, row_number() OVER (
       |      PARTITION BY event_type ORDER BY h) AS rn
       |    FROM hs)
       |  WHERE rn = $KmvK)
       |SELECT nd.event_type, nd.nd_users,
       |  (CASE WHEN kth.hk IS NOT NULL
       |    THEN (${KmvK - 1} * 4294967296) // kth.hk
       |    ELSE nd.nd_users END)::BIGINT AS est_kmv,
       |  kth.hk IS NULL AS exact_regime,
       |  ((1000 * abs((CASE WHEN kth.hk IS NOT NULL
       |    THEN (${KmvK - 1} * 4294967296) // kth.hk
       |    ELSE nd.nd_users END) - nd.nd_users)) // nd.nd_users)::BIGINT
       |    AS err_pm
       |FROM nd LEFT JOIN kth USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // ---- q23: histogram ------------------------------------------------

  /** Fixed-width histogram via width_bucket-style bucketing — declared
    * TODO in the reference (jar/ProfileJob.java:69). Bin width 5000 over
    * a fixed domain so bucket ids are scale-stable. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupBy(floor(col("l_extendedprice") / lit(5000d)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  val histogramSql: String =
    """SELECT floor(l_extendedprice / 5000)::BIGINT AS bucket, count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- q39: shuffle-free fact-to-fact join over bucketed tables ------

  private val BucketCount = 8

  /** Revenue per high-value order over BUCKETED lineitem ⋈ orders —
    * the q18 fact-to-fact core with the shuffle designed out of it.
    *
    * Both sides are stored bucketed+sorted by the join key
    * ([[graft.sources.BucketedTables]]), so the sort-merge join needs no
    * Exchange and no Sort on either side, and the order-keyed
    * aggregation reuses the join's clustering (HashPartitioning on
    * `o_orderkey` satisfies the groupBy's ClusteredDistribution). The
    * ONLY shuffle in the plan is the final presentation ORDER BY over
    * the small result. At 100 TB this converts the nightly fact-to-fact
    * join from two full-table shuffles into a co-located bucket scan,
    * priced once at write time; PlanSpec locks the shape. */
  def bucketedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val (liName, ordName) = ensureBucketed(spark, dir)
    val li = spark.table(liName)
    val o = spark.table(ordName)
    // force SMJ even where one side would fit broadcast: the 100 TB
    // case this models has no broadcast-able side
    li.hint("merge")
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("o_totalprice") > lit(400000d))
      .groupBy(col("o_orderkey"), col("o_orderstatus"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderkey")
  }

  /** Bucketed copies of lineitem/orders for `dir`, written once per
    * (catalog, dir): the bucket layout only exists through the catalog,
    * and re-runs in the same session (bench reps, repeated plans) reuse
    * the first write — modeling the real workload where bucketing is an
    * ingest-time decision, not a per-query one. Only the query-relevant
    * columns are bucketed (a 100 TB ingest would bucket the full
    * table; the layout mechanics are identical). */
  private def ensureBucketed(
      spark: SparkSession, dir: String): (String, String) = synchronized {
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    val (liName, ordName) = (s"li_bkt_$tag", s"ord_bkt_$tag")
    if (!spark.catalog.tableExists(liName) ||
        !spark.catalog.tableExists(ordName)) {
      val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed_$tag"
      graft.sources.BucketedTables.writeBucketed(
        table(spark, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        liName, s"$base/lineitem", "l_orderkey", BucketCount)
      graft.sources.BucketedTables.writeBucketed(
        table(spark, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ordName, s"$base/orders", "o_orderkey", BucketCount)
    }
    (liName, ordName)
  }

  /** Oracle over the PLAIN parquet tables — DuckDB doesn't see the
    * bucketing, which is the point: layout changes plans, not answers. */
  val bucketedRevenueSql: String =
    s"""SELECT o_orderkey, o_orderstatus,
       |  ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_totalprice > 400000
       |GROUP BY o_orderkey, o_orderstatus
       |ORDER BY o_orderkey""".stripMargin

  // ---- q166: weighted exact quantiles ---------------------------------

  val WeightedPs = Seq(0.5, 0.9, 0.99)

  /** Quantiles of a WEIGHTED population — units-weighted price
    * percentiles here; token-weighted doc-length or multiplicity-
    * weighted bootstrap percentiles in the pipeline setting. Semantics
    * = `quantile_cont` over the multiset where each row repeats
    * `l_quantity` times; the production path
    * ([[graft.operators.ExactQuantile.weightedQuantiles]]) descends
    * the same bounded-memory histogram refinement as q65/q69 but by
    * CUMULATIVE WEIGHT, never materializing the expansion — the
    * ORACLE materializes it (`unnest(generate_series(1, w))`), so the
    * gate proves the two are the same distribution to the bit.
    *
    * Scale shape: the expansion the operator avoids is ×avg(weight)
    * data (25× here; ×thousands for token weights) — the whole point;
    * refinement scans carry two longs per bin. */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("w"))
    val qs = graft.operators.ExactQuantile
      .weightedQuantiles(li, "price", "w", WeightedPs)
    val w = li.agg(sum(col("w"))).head().getLong(0)
    import spark.implicits._
    Seq((w, BigDecimal(qs(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(qs(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(qs(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("w_total", "p50", "p90", "p99")
  }

  val weightedQuantilesSql: String =
    s"""WITH e AS (
       |  SELECT l_extendedprice AS price,
       |    unnest(generate_series(1, l_quantity::INT)) AS rep
       |  FROM lineitem)
       |SELECT count(*)::BIGINT AS w_total,
       |  round(quantile_cont(price, 0.5), 6) AS p50,
       |  round(quantile_cont(price, 0.9), 6) AS p90,
       |  round(quantile_cont(price, 0.99), 6) AS p99
       |FROM e""".stripMargin

  // ---- q233: V-optimal histogram (dynamic programming) -----------------

  /** Fine-grid resolution the DP runs over. */
  val VoptCells = 64

  /** Output buckets. */
  val VoptBuckets = 8

  /** V-OPTIMAL histogram (Jagadish et al., VLDB'98 "Optimal
    * Histograms with Quality Guarantees") — the synopsis the family's
    * fixed-width (q23), Scott (q33), and equi-depth (q78) heuristics
    * approximate: [[VoptBuckets]] variable-width buckets minimizing
    * within-bucket variance, found EXACTLY by dynamic programming
    * `dp_k(i) = min_j dp_{k−1}(j) + sse(j+1, i)` over a
    * [[VoptCells]]-cell equi-width pre-grid of order totals. The
    * objective is the count-scaled integer SSE over cell indices
    * (`w·Σx² − (Σx)²` from prefix sums — exact, no float), ties
    * broken to the SMALLEST split, so the optimum is unique and both
    * engines agree bit-for-bit; the oracle replays the DP as K
    * unrolled min-stages plus a backtracking chain in SQL.
    *
    * Scale shape: ONE distributed pass → min/max, one more → 64 cell
    * counts; the DP itself runs on the driver over the fixed-size
    * grid (64·64·8 integer ops — the centroid-collect economics;
    * the grid never grows with the data). */
  def voptimalHistogram(spark: SparkSession, dir: String): DataFrame = {
    val cents = table(spark, dir, "orders")
      .select(expr("cast(floor(o_totalprice * 100) as long)").as("c"))
    val mm = cents.agg(min("c").as("lo"), max("c").as("hi")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    val cnts = new Array[Long](VoptCells)
    cents
      .select(expr(s"((c - $lo) * $VoptCells) div $span").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .collect().foreach(r => cnts(r.getLong(0).toInt) = r.getLong(1))
    val rows = voptDp(cnts, VoptBuckets).zipWithIndex.map {
      case ((l, h, n, w), t) => (t + 1L, l.toLong, h - 1L, n, w)
    }
    import spark.implicits._
    rows.toDF("bucket", "lo_cell", "hi_cell", "n_rows", "cost")
      .orderBy("bucket")
  }

  /** The exact DP over cell counts: returns one (loBound, hiBound,
    * nRows, cost) per bucket, bounds as positions (bucket = cells
    * [lo, hi)). Smallest-split tie-break; pure integers. Exposed for
    * the spec's exhaustive-optimality check. */
  private[graft] def voptDp(cnts: Array[Long], buckets: Int)
      : Seq[(Int, Int, Long, Long)] = {
    val m = cnts.length
    val cc = new Array[Long](m + 1)
    val cs = new Array[Long](m + 1)
    val css = new Array[Long](m + 1)
    for (i <- 1 to m) {
      cc(i) = cc(i - 1) + cnts(i - 1)
      cs(i) = cs(i - 1) + cnts(i - 1) * (i - 1)
      css(i) = css(i - 1) + cnts(i - 1) * (i - 1).toLong * (i - 1)
    }
    def cost(j: Int, i: Int): Long = {
      val w = cc(i) - cc(j)
      w * (css(i) - css(j)) - (cs(i) - cs(j)) * (cs(i) - cs(j))
    }
    // dp(k)(i): best cost of covering cells [0, i) with k buckets;
    // pred holds the SMALLEST optimal split (deterministic tie-break)
    val dp = Array.fill(buckets + 1, m + 1)(Long.MaxValue)
    val pred = Array.fill(buckets + 1, m + 1)(-1)
    for (i <- 1 to m) dp(1)(i) = cost(0, i)
    for (k <- 2 to buckets; i <- k to m) {
      var best = Long.MaxValue
      var bj = -1
      for (j <- (k - 1) until i) {
        if (dp(k - 1)(j) != Long.MaxValue) {
          val v = dp(k - 1)(j) + cost(j, i)
          if (v < best) { best = v; bj = j }
        }
      }
      dp(k)(i) = best
      pred(k)(i) = bj
    }
    val bounds = new Array[Int](buckets + 1)
    bounds(buckets) = m
    for (k <- buckets until 0 by -1)
      bounds(k - 1) = if (k == 1) 0 else pred(k)(bounds(k))
    (1 to buckets).map { t =>
      val (l, h) = (bounds(t - 1), bounds(t))
      (l, h, cc(h) - cc(l), cost(l, h))
    }
  }

  val voptimalHistogramSql: String = {
    val K = VoptBuckets
    val stages = (2 to K).map { k =>
      s"""cand$k AS (
         |  SELECT c.i, c.j, d.v + c.w AS tot
         |  FROM cost c JOIN dp${k - 1} d ON d.i = c.j),
         |dp$k AS (SELECT i, min(tot) AS v FROM cand$k GROUP BY i),
         |pr$k AS (
         |  SELECT c.i, min(c.j) AS p
         |  FROM cand$k c JOIN dp$k USING (i) WHERE c.tot = dp$k.v
         |  GROUP BY c.i)""".stripMargin
    }.mkString(",\n")
    val backtrack = (K - 1 to 1 by -1).map { t =>
      if (t == K - 1)
        s"b$t AS (SELECT p AS b FROM pr$K WHERE i = $VoptCells)"
      else
        s"b$t AS (SELECT p AS b FROM pr${t + 1} JOIN b${t + 1} ON pr${t + 1}.i = b${t + 1}.b)"
    }.mkString(",\n")
    val bucketRows = (1 to K).map { t =>
      val loB = if (t == 1) "0" else s"(SELECT b FROM b${t - 1})"
      val hiB = if (t == K) s"$VoptCells" else s"(SELECT b FROM b$t)"
      s"SELECT $t AS bucket, $loB AS lo, $hiB AS hi"
    }.mkString(" UNION ALL ")
    s"""WITH cents AS (
       |  SELECT (floor(o_totalprice * 100))::BIGINT AS c FROM orders),
       |mm AS (SELECT min(c) AS lo, max(c) AS hi FROM cents),
       |cellv AS (
       |  SELECT ((c - lo) * $VoptCells) // (hi - lo + 1) AS cell
       |  FROM cents, mm),
       |cnts AS (
       |  SELECT g.i AS cell, count(cellv.cell)::BIGINT AS cnt
       |  FROM (SELECT unnest(range(0, $VoptCells)) AS i) g
       |  LEFT JOIN cellv ON cellv.cell = g.i GROUP BY 1),
       |pre AS (
       |  SELECT cell + 1 AS i,
       |    sum(cnt) OVER (ORDER BY cell) AS cc,
       |    sum(cnt * cell) OVER (ORDER BY cell) AS cs,
       |    sum(cnt * cell * cell) OVER (ORDER BY cell) AS css
       |  FROM cnts
       |  UNION ALL SELECT 0, 0, 0, 0),
       |cost AS (
       |  SELECT a.i AS j, b.i AS i,
       |    (b.cc - a.cc) * (b.css - a.css)
       |      - (b.cs - a.cs) * (b.cs - a.cs) AS w
       |  FROM pre a JOIN pre b ON a.i < b.i),
       |dp1 AS (SELECT i, w AS v FROM cost WHERE j = 0),
       |$stages,
       |$backtrack,
       |bk AS ($bucketRows)
       |SELECT bk.bucket::BIGINT AS bucket, bk.lo::BIGINT AS lo_cell,
       |  (bk.hi - 1)::BIGINT AS hi_cell,
       |  (ph.cc - pl.cc)::BIGINT AS n_rows,
       |  ((ph.cc - pl.cc) * (ph.css - pl.css)
       |    - (ph.cs - pl.cs) * (ph.cs - pl.cs))::BIGINT AS cost
       |FROM bk JOIN pre pl ON pl.i = bk.lo JOIN pre ph ON ph.i = bk.hi
       |ORDER BY bucket""".stripMargin
  }

  // ---- q312: TPC-H Q5 — cyclic star join (local-supplier revenue) ---------

  /** The Q5 date window (one year, TPC-H's shape on this corpus's
    * 1995-2001 span). */
  val Q5DateLo = "1996-01-01"
  val Q5DateHi = "1997-01-01"
  val Q5Region = "ASIA"

  /** TPC-H Q5 — the canonical CYCLIC star join q18 doesn't exercise:
    * six tables with the local-supplier constraint `c_nationkey =
    * s_nationkey` closing a cycle in the join graph (customer-orders-
    * lineitem-supplier-nation), plus a selective region filter and a
    * one-year date window. This is the optimizer workout: the region
    * and date predicates must push into the dimension/fact scans, the
    * three small dimensions broadcast, and only orders⋈lineitem⋈
    * supplier shuffle — exactly what Catalyst picks from the
    * declarative form, which is the point (no join hints beyond
    * broadcast on the bounded dims). Money in the exact-cents
    * convention. */
  def localSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(Q5DateLo) &&
        col("o_orderdate") < lit(Q5DateHi))
    val c = table(spark, dir, "customer")
    val su = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region").filter(col("r_name") === Q5Region)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
        su("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val localSupplierRevenueSql: String =
    s"""SELECT n_name,
       |  (sum(floor((l_extendedprice * (1 - l_discount)) * 100)::BIGINT)
       |    ::DOUBLE / 100) AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |  AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$Q5Region'
       |  AND o_orderdate >= '$Q5DateLo' AND o_orderdate < '$Q5DateHi'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---- q316: observed metrics (one-pass side-channel audit) ---------------

  /** The q312 date window reused for the observed slice. */
  private val ObsDateLo = "1996-01-01"

  /** `Dataset.observe` / CollectMetrics — the ONE-PASS audit channel:
    * ingest metrics (rows seen, quantity mass, null count) collected
    * on the UNFILTERED stream as it flows through the very same scan
    * that feeds the windowed aggregate — no second pass, no race
    * between "the data we audited" and "the data we aggregated" (the
    * reconciliation bug a separate audit query always risks). The
    * observed values ride back on the driver callback and publish as
    * constant columns beside the per-flag aggregate; the oracle
    * recomputes both sides from the table. The aggregate rows are
    * bounded (≤ flag cardinality), so the driver-side merge is
    * constant work. */
  def observedMetrics(spark: SparkSession, dir: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    val li = table(spark, dir, "lineitem")
    val audited = li.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(col("l_quantity").cast("long")).as("qty_seen"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
        .as("null_shipdates"))
    val agg = audited
      .filter(col("l_shipdate") >= lit(ObsDateLo))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice")).as("gross"))
    val rows = agg.collect() // bounded: one row per flag; fires observe
    val m = obs.get
    val s = spark
    import s.implicits._
    val out = rows.toSeq.map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), m("rows_seen").asInstanceOf[Long],
      m("qty_seen").asInstanceOf[Long],
      m("null_shipdates").asInstanceOf[Long]))
    out.toDF("l_returnflag", "n_items", "gross", "rows_seen",
        "qty_seen", "null_shipdates")
      .orderBy("l_returnflag")
  }

  val observedMetricsSql: String =
    s"""WITH m AS (
       |  SELECT count(*)::BIGINT AS rows_seen,
       |    sum(l_quantity::BIGINT)::BIGINT AS qty_seen,
       |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT
       |      AS null_shipdates
       |  FROM lineitem)
       |SELECT l_returnflag, count(*)::BIGINT AS n_items,
       |  ${moneySumSql("l_extendedprice")} AS gross,
       |  m.rows_seen, m.qty_seen, m.null_shipdates
       |FROM lineitem, m
       |WHERE l_shipdate >= '$ObsDateLo'
       |GROUP BY l_returnflag, m.rows_seen, m.qty_seen, m.null_shipdates
       |ORDER BY l_returnflag""".stripMargin
}
