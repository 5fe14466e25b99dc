package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q317/q318 contracts: the curation-funnel stage chain is a driver-side
  * replay of the per-doc flags, the stages are monotone by construction,
  * and the by-source attribution tiles the global funnel exactly. */
class FunnelSpec extends SparkSpec {

  private def replayFlags(): Seq[(String, Boolean, Boolean, Boolean, Boolean, Long)] = {
    import graft.text.TextStats
    val losers = PipelineQueries.storedVerifiedPairs(spark, sfDir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        TextStats.nTokens(col("text")).cast("long").as("nw"),
        round(TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("qm"),
        TextStats.langId(col("text")).as("lang"))
      .collect().map { r =>
        val c1 = r.getAs[String]("lang") == "en"
        val c2 = c1 && r.getAs[Long]("qm") >= PipelineQueries.FunnelQualityMinMicro
        val c3 = c2 && r.getAs[Long]("nw") >= CleaningQueries.GopherMinWords &&
          r.getAs[Long]("nw") <= CleaningQueries.GopherMaxWords
        val c4 = c3 && !losers(r.getAs[Long]("doc_id"))
        (r.getAs[String]("source"), c1, c2, c3, c4, r.getAs[Long]("nw"))
      }.toSeq
  }

  test("q317: stage counts replay from per-doc flags; monotone; drops account") {
    val rows = graft.SparkEntry
      .queries("q317_curation_funnel")(spark, sfDir).collect()
    assert(rows.length == 5)
    val flags = replayFlags()
    val wantN = Seq(flags.size.toLong, flags.count(_._2).toLong,
      flags.count(_._3).toLong, flags.count(_._4).toLong,
      flags.count(_._5).toLong)
    val wantT = Seq(flags.map(_._6).sum,
      flags.filter(_._2).map(_._6).sum, flags.filter(_._3).map(_._6).sum,
      flags.filter(_._4).map(_._6).sum, flags.filter(_._5).map(_._6).sum)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("stage_idx") == i.toLong)
      assert(r.getAs[Long]("n_docs") == wantN(i), s"stage $i docs")
      assert(r.getAs[Long]("n_tokens") == wantT(i), s"stage $i tokens")
      assert(r.getAs[Long]("yield_pm") == 1000L * wantN(i) / wantN.head)
      val prev = if (i == 0) wantN.head else wantN(i - 1)
      assert(r.getAs[Long]("stage_drop_pm") ==
        1000L * (prev - wantN(i)) / math.max(prev, 1L))
    }
    // cumulative predicates: each stage can only shrink the survivor set
    assert(wantN == wantN.sorted.reverse)
    // the funnel must actually filter somewhere on this corpus
    assert(wantN.last < wantN.head)
  }

  test("q318: per-source rows tile the global funnel; kept <= all per source") {
    val rows = graft.SparkEntry
      .queries("q318_funnel_by_source")(spark, sfDir).collect()
    val flags = replayFlags()
    assert(rows.length == flags.map(_._1).distinct.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val f = flags.filter(_._1 == s)
      assert(r.getAs[Long]("n_all") == f.size.toLong, s)
      assert(r.getAs[Long]("n_lang") == f.count(_._2).toLong, s)
      assert(r.getAs[Long]("n_quality") == f.count(_._3).toLong, s)
      assert(r.getAs[Long]("n_length") == f.count(_._4).toLong, s)
      assert(r.getAs[Long]("n_kept") == f.count(_._5).toLong, s)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_all"))
    }
    // tiling: by-source counts sum to the global stage-4 survivors
    val funnel = graft.SparkEntry
      .queries("q317_curation_funnel")(spark, sfDir).collect()
    val globalKept = funnel.find(_.getAs[String]("stage") == "dedup")
      .get.getAs[Long]("n_docs")
    assert(rows.map(_.getAs[Long]("n_kept")).sum == globalKept)
  }
}
