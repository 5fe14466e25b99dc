package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q310/q311/q312 contracts. */
class IngestAndRankSpec extends SparkSpec {

  test("schema evolution: generations really differ; merge reconciles") {
    // run once to stage
    val out = graft.SparkEntry
      .queries("q310_schema_evolution")(spark, sfDir).collect()
    // the engine's per-(dir, fingerprint) tag — NOT listFiles().head:
    // Verify runs at other SFs leave their own graft_evolved_orders_*
    // stores in the shared tmpdir, and an arbitrary pick reads a
    // different corpus's generations
    val src = new java.io.File(s"$sfDir/orders.parquet")
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        s"$sfDir:${src.length}:${src.lastModified}:evolved"))
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_evolved_orders_$tag")
    val g1 = spark.read.parquet(s"$base/gen1")
    val g2 = spark.read.parquet(s"$base/gen2")
    assert(!g1.columns.contains("channel"), "gen1 must predate channel")
    assert(g2.columns.contains("channel"))
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
    assert(merged.columns.contains("channel"))
    // gen-1 rows surface as NULL channel → folded to 'unknown'
    val unk = out.find(_.getString(0) == "unknown").get
    assert(unk.getLong(1) == g1.count())
    assert(out.map(_.getLong(1)).sum == g1.count() + g2.count())
  }

  test("RBO: self-identity hits the depth-20 ceiling; replay") {
    val row = graft.SparkEntry
      .queries("q311_rbo_rankings")(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_sources") == 20)
    // identity: every item at equal ranks → Σ CW(d) over d=1..20
    assert(QualityQueries.RboSuffixMicro.sum == 878423L ||
      math.abs(QualityQueries.RboSuffixMicro.sum - 878423L) <= 10,
      s"ceiling drifted: ${QualityQueries.RboSuffixMicro.sum}")
    // replay from per-source sums
    val per = QueryUtil.table(spark, sfDir, "documents")
      .groupBy("source")
      .agg(
        sum(size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
          .as("tok"),
        sum(round(graft.text.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long")).as("qual"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ra = per.sortBy(p => (-p._2, p._1)).map(_._1).zipWithIndex.toMap
    val rb = per.sortBy(p => (-p._3, p._1)).map(_._1).zipWithIndex.toMap
    // rbo_d20_micro carries the depth-20 truncation in its name: a
    // source ranked past depth 20 on either side contributes nothing
    val want = per.map { p =>
      val d = math.max(ra(p._1), rb(p._1))
      if (d < 20) QualityQueries.RboSuffixMicro(d) else 0L
    }.sum
    assert(row.getAs[Long]("rbo_d20_micro") == want)
    assert(row.getAs[Long]("rbo_d20_micro") <= 878423L)
  }

  test("Q5 plan: dims broadcast, date filter pushed to the orders scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    spark.catalog.clearCache()
    val df = graft.SparkEntry
      .queries("q312_local_supplier_revenue")(spark, sfDir)
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other => other +: other.children.flatMap(walk)
      }
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[BroadcastExchangeExec]) >= 3,
      "customer/nation/region should broadcast")
    val ordersScan = nodes.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("orders.parquet")) => s
    }
    assert(ordersScan.nonEmpty)
    assert(ordersScan.head.metadata.get("PushedFilters").exists(f =>
      f.contains("o_orderdate")),
      s"date filter not pushed: ${ordersScan.head.metadata}")
    assert(df.collect().nonEmpty)
  }

  test("recursive CTE: min-hop reach equals the iterative walk") {
    val rec = graft.SparkEntry
      .queries("q313_recursive_reach")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rec.nonEmpty)
    assert(rec.values.min == 0 && rec.values.max <= 3)
    // replay: driver-side BFS over the same backbone
    val arcs = {
      val ui = QueryUtil.table(spark, sfDir, "events")
        .select(col("user_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("i"))
        .filter(col("i") =!= "")
        .select(col("user_id"), col("i").cast("long").as("item"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      val byU = ui.groupBy(_._1).values
      val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
      byU.foreach { evs =>
        val items = evs.map(_._2).distinct.sorted
        for (a <- items; b <- items if a < b)
          counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
      }
      counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
        .take(graft.queries.GraphQueries.TriEdges).map(_._1)
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    }
    val adj = arcs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = arcs.map(_._1).min
    var dist = Map(seed -> 0L)
    var frontier = Seq(seed)
    for (h <- 1 to graft.queries.GraphQueries.RecReachHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist ++= frontier.map(_ -> h.toLong)
    }
    assert(rec == dist)
  }

  test("custom sink: commit protocol publishes exactly the aggregate") {
    val row = graft.SparkEntry
      .queries("q314_custom_sink")(spark, sfDir).collect().head
    val want = QueryUtil.table(spark, sfDir, "documents")
      .agg(count(lit(1)), sum("doc_id"),
        sum(col("n_chars").cast("long"))).collect().head
    assert(row.getLong(0) == want.getLong(0))
    assert(row.getLong(1) == want.getLong(1))
    assert(row.getLong(2) == want.getLong(2))
    // re-running overwrites atomically (same artifact, same values)
    val again = graft.SparkEntry
      .queries("q314_custom_sink")(spark, sfDir).collect().head
    assert(again == row)
  }

  test("DPP: the fact scan carries a dynamic-pruning partition filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    spark.catalog.clearCache()
    val df = graft.SparkEntry
      .queries("q315_dynamic_partition_pruning")(spark, sfDir)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    val factScans = scans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(
        _.toString.contains("graft_part_events_")))
    assert(factScans.nonEmpty, "no partitioned fact scan in the plan")
    assert(factScans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no dynamic pruning: ${factScans.map(_.partitionFilters)}")
    assert(df.collect().nonEmpty)
  }

  test("observed metrics equal the direct unfiltered aggregates") {
    val rows = graft.SparkEntry
      .queries("q316_observed_metrics")(spark, sfDir).collect()
    val want = QueryUtil.table(spark, sfDir, "lineitem")
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
      .collect().head
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_seen") == want.getLong(0))
      assert(r.getAs[Long]("qty_seen") == want.getLong(1))
      assert(r.getAs[Long]("null_shipdates") == 0L)
    }
    // the filtered aggregate really is a subset of the observed stream
    assert(rows.map(_.getAs[Long]("n_items")).sum <= want.getLong(0))
  }
}
