package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Driver replays for q304/q305/q306. */
class FrontierAndShiftSpec extends SparkSpec {

  test("detector agreement: Venn arithmetic is consistent") {
    val r = graft.SparkEntry
      .queries("q304_detector_agreement")(spark, sfDir).collect().head
    val (mh, sh, both) = (r.getAs[Long]("minhash_pairs"),
      r.getAs[Long]("simhash_pairs"), r.getAs[Long]("n_both"))
    assert(both <= math.min(mh, sh))
    assert(r.getAs[Long]("only_minhash") == mh - both)
    assert(r.getAs[Long]("only_simhash") == sh - both)
    val union = mh + sh - both
    assert(r.getAs[Long]("agreement_pm") ==
      1000L * both / math.max(union, 1L))
    assert(mh > 0 && sh > 0, "both detectors fire on the test corpus")
  }

  test("pareto frontier: no member dominated, no non-member undominated") {
    val frontier = graft.SparkEntry
      .queries("q305_pareto_frontier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        round(graft.text.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = all.exists(y =>
      y._2 >= x._2 && y._3 >= x._3 && (y._2 > x._2 || y._3 > x._3))
    val want = all.filter(!dominated(_)).sortBy(_._1).toSeq
    assert(frontier.sortBy(_._1).toSeq == want)
    assert(frontier.nonEmpty && frontier.length < all.length)
  }

  test("Wasserstein-1: exact quantile-area replay per source pair") {
    val rows = graft.SparkEntry
      .queries("q306_wasserstein_shift")(spark, sfDir).collect()
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byS = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val (xs, ys) = (byS(a), byS(b))
      val vs = (xs ++ ys).distinct.sorted
      var area = 0L
      vs.zip(vs.tail).foreach { case (v, nxt) =>
        val fa = xs.count(_ <= v).toLong
        val fb = ys.count(_ <= v).toLong
        area += math.abs(fa * ys.length - fb * xs.length) * (nxt - v)
      }
      assert(r.getAs[Long]("w1_milli_chars") ==
        1000L * area / (xs.length.toLong * ys.length), s"($a,$b)")
    }
    assert(rows.length >= 10)
  }

  test("BH-FDR: step-up rule replay; BH never rejects more than raw") {
    val rows = graft.SparkEntry
      .queries("q307_bh_fdr")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 10)
    val z = rows.map(_.getAs[Long]("z2_milli"))
    assert(z.sameElements(z.sorted.reverse), "ranked by z2 desc")
    val crit = QualityQueries.BhCritZ2Milli
    val k = (1 to 10).filter(i => z(i - 1) >= crit(i - 1))
      .lastOption.getOrElse(0)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("crit_z2_milli") == crit(i))
      assert(r.getAs[Boolean]("bh_reject") == (i + 1 <= k))
      assert(r.getAs[Boolean]("raw_reject") == (z(i) >= crit.last))
      // step-up vs per-test: BH at FDR alpha rejects a SUBSET of the
      // raw alpha gates (crit(k) >= crit(m) for every k)
      if (r.getAs[Boolean]("bh_reject"))
        assert(r.getAs[Boolean]("raw_reject"))
    }
  }

  test("Markov accuracy: argmax prediction and scoring replay") {
    val rows = graft.SparkEntry
      .queries("q308_markov_accuracy")(spark, sfDir).collect()
    val tr = QueryUtil.eventsTsUs(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values.toSeq
      .flatMap { evs =>
        val o = evs.sortBy(e => (e._2, e._3)).map(_._4)
        o.zip(o.tail)
      }
    val counts = tr.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val from = r.getAs[String]("prev_type")
      val pred = counts.keys.filter(_._1 == from).toSeq
        .map { k => (k._2, counts(k)) }
        .sortBy { case (t, c) => (-c, t) }.head._1
      assert(r.getAs[String]("predicted_next") == pred, from)
      val pairs = tr.filter(_._1 == from)
      assert(r.getAs[Long]("n_pairs") == pairs.size)
      assert(r.getAs[Long]("n_correct") == pairs.count(_._2 == pred))
    }
    assert(rows.length == 5)
  }

  test("chained streaming: the staged source really carries duplicates") {
    // the q309 gate proves dedup+window == clean batch; this proves the
    // test wasn't vacuous (duplicates exist to absorb)
    graft.SparkEntry.queries("q309_stream_chained")(spark, sfDir).count()
    val staged = new java.io.File(sys.props("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_duped_events_"))
    assert(staged.nonEmpty)
    val anyDuped = staged.exists { d =>
      val df = spark.read.parquet(d.getPath)
      val n = df.count()
      val nd = df.select("event_id").distinct().count()
      n > nd + 1 // sentinel aside, planted copies collapse under distinct
    }
    assert(anyDuped)
  }
}
