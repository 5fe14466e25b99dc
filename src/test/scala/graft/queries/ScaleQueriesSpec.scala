package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gates for the round-3 scale queries that are approximate or
  * streaming (their driver gate is rows-only or the batch oracle):
  * q48's sketch-cube error bound and q49's stream==batch equality. */
class ScaleQueriesSpec extends SparkSpec {

  test("q48: union-merged daily HLL sketches estimate within 5% of exact") {
    val got = ScaleQueries.hllCube(spark, sfDir).head()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(exact > 0 && got.getAs[Long]("nd_users") == exact)
    // the in-query accuracy claim (estimate within HllRelErr of exact)
    assert(got.getAs[Boolean]("within_bound"))
    // the cube really covered the whole table
    assert(got.getAs[Long]("n_events") == ev.count())
  }

  test("q53: streaming sessions equal batch sessions closed at the horizon") {
    val got = ScaleQueries.streamSessions(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // batch q37 result restricted to sessions whose close (last event +
    // gap) precedes the final watermark (max event time)
    val batch = AnalyticsQueries.sessionization(spark, sfDir)
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
    val horizon = ev.agg(max(col("ts_us"))).head().getLong(0)
    val gapUs = 12L * 3600 * 1000000
    // session close (last event + gap) is not in q37's output;
    // recompute it per (user, session_start) from the raw timestamps
    val tsByUser: Map[Long, Seq[Long]] = ev
      .groupBy(col("user_id")).agg(collect_list(col("ts_us")).as("all_ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val want = batch.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }.filter { case (uid, startUs, _, _) =>
      var last = startUs
      tsByUser(uid).dropWhile(_ < startUs).foreach { t =>
        if (t <= last + gapUs) last = t
      }
      last + gapUs <= horizon
    }.toSet
    assert(got.nonEmpty && got == want)
  }

  test("q59: streaming windowed HLL estimates within 5% of exact, exact counts match") {
    // output: (day_epoch, n_events, nd_users, within_bound) — exact
    // sides recomputed here independently; within_bound carries the
    // streaming estimate's accuracy claim
    val got = ScaleQueries.streamWindowDistinct(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val exact = QueryUtil.eventsEventTs(spark, sfDir)
      .groupBy(window(col("event_ts"), "1 day"))
      .agg(countDistinct(col("user_id")).as("nd"), count(lit(1)).as("n"))
      .select(unix_seconds(col("window.start")).as("day"), col("nd"), col("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got.length == exact.size)
    got.foreach { case (day, n, nd, ok) =>
      val (ndExact, nExact) = exact(day)
      assert(n == nExact, s"day=$day exact event count mismatch")
      assert(nd == ndExact, s"day=$day exact distinct mismatch")
      assert(ok, s"day=$day streaming estimate outside HllRelErr of $nd")
    }
  }

  test("q49: stream-static enrichment equals the batch join") {
    val got = ScaleQueries.streamEnrich(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
    val want = ev.join(cust, col("user_id") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_events"),
        QueryUtil.moneySum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("q150: RRF fusion equals the driver-side fold of the two rank lists") {
    import ScaleQueries.{RrfK, RrfTopK, RrfDenseQuery}
    val got = ScaleQueries.rrfFusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // rebuild both rank lists independently of the query's own fusion
    val sparse = ScaleQueries.bm25(spark, sfDir)
      .orderBy(col("bm25").desc, col("doc_id")).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dense = graft.similarity.CosineKnn.topK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === RrfDenseQuery), RrfTopK)
      .orderBy("rank").collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("rank").toLong).toMap

    val want = (sparse.keySet ++ dense.keySet).toSeq.map { d =>
      val br = sparse.getOrElse(d, 0L)
      val dr = dense.getOrElse(d, 0L)
      val s = (if (br > 0) 1000000L / (RrfK + br) else 0L) +
        (if (dr > 0) 1000000L / (RrfK + dr) else 0L)
      (d, s, br, dr)
    }.sortBy { case (d, s, _, _) => (-s, d) }
      .zipWithIndex.map { case ((d, s, br, dr), i) => (i + 1L, d, s, br, dr) }
    assert(got.toSeq == want, "fusion differs from the driver-side fold")
    // both retrievers actually contributed to the fused list
    assert(got.exists(_._4 > 0) && got.exists(_._5 > 0))
    assert(got.map(_._1).toSeq == (1L to got.length))
  }

  test("q165: attribution conserves every cent and equals a driver replay") {
    import ScaleQueries.RangeWindowUs
    val got = ScaleQueries.multiTouchAttribution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = QueryUtil.eventsTsUs(spark, sfDir)
      .select("event_id", "user_id", "ts_us", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val purchases = ev.filter(_._4 == "purchase")
      .map(p => (p._1, p._2, p._3, math.floor(p._5 * 100d).toLong))
    val clicks = ev.filter(_._4 == "click").map(c => (c._1, c._2, c._3))
    val attr = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    var (unN, unC) = (0L, 0L)
    purchases.foreach { case (_, u, pts, cents) =>
      val w = clicks.filter(c => c._2 == u &&
        c._3 > pts - RangeWindowUs && c._3 <= pts)
        .sortBy(c => (c._3, c._1))
      if (w.isEmpty) { unN += 1; unC += cents }
      else {
        val n = w.length
        val share = cents / n
        w.zipWithIndex.foreach { case ((_, _, cts), i) =>
          val a = share + (if (i == 0) cents - n * share else 0L)
          val ch = (cts / 3600000000L) % 24
          val (pn, pc) = attr.getOrElse(ch, (0L, 0L))
          attr(ch) = (pn + 1, pc + a)
        }
      }
    }
    val want = (attr.toSeq.map { case (ch, (n, c)) => (ch, n, c) } :+
      (-1L, unN, unC)).sortBy(_._1)
    assert(got.toSeq == want)
    // conservation to the cent — the property the integer split exists for
    assert(got.map(_._3).sum == purchases.map(_._4).sum)
  }

  test("q264: dedup yield is consistent with q56's clusters and the corpus stats") {
    val row = ScaleQueries.dedupYield(spark, sfDir).collect().head
    val (nDocs, nPairs, nClusters, docsRm, toksRm, charsRm, tokPm, chPm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    // cluster structure must match q56's published clusters exactly
    val clusters = ScaleQueries.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(nClusters == clusters.length.toLong)
    assert(docsRm == clusters.map(_._2 - 1).sum)
    // removed ids from the cluster checksums: members minus the rep
    val stats = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id",
        "cast(size(split(lower(trim(text)), '\\\\s+')) as long) as toks",
        "cast(length(text) as long) as chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(nDocs == stats.length.toLong)
    val tt = stats.map(_._2).sum; val tc = stats.map(_._3).sum
    assert(tokPm == 1000L * toksRm / tt && chPm == 1000L * charsRm / tc)
    // pair count matches q10's published pair table
    val q10n = graft.queries.PipelineQueries.dedupMinhash(spark, sfDir)
      .count()
    assert(nPairs == q10n && nPairs > 0 && docsRm > 0)
    // removed masses are positive and bounded by the corpus totals
    assert(toksRm > 0 && toksRm < tt && charsRm > 0 && charsRm < tc)
  }

  test("q265: dup attribution is conserved against q264 and q10's pairs") {
    val out = ScaleQueries.dupAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // per-source doc counts cover the corpus
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.map(_._2).sum == srcOf.size.toLong)
    // removal conservation against q264's yield card
    val yieldRow = ScaleQueries.dedupYield(spark, sfDir).collect().head
    assert(out.map(_._3).sum == yieldRow.getLong(3), "docs_removed split")
    // pair attribution conservation against q10's published pairs:
    // within counted once, cross counted once per side
    val pairs = graft.queries.PipelineQueries.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.count(p => srcOf(p._1) == srcOf(p._2)).toLong
    val cross = pairs.count(p => srcOf(p._1) != srcOf(p._2)).toLong
    assert(out.map(_._4).sum == within, "within_pairs conservation")
    assert(out.map(_._5).sum == 2 * cross, "cross_pairs double-count")
    // rate arithmetic
    out.foreach { case (s, n, rm, _, _, pm) =>
      assert(pm == 1000L * rm / n, s"$s rate") }
  }
}
