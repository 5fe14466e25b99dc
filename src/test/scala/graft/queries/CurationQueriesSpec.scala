package graft.queries

import graft.SparkSpec

class CurationQueriesSpec extends SparkSpec {

  test("q94: packing is gapless — each doc starts where the previous ended") {
    val rows = CurationQueries.sequencePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length > 100)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between doc ${a._1} and ${b._1}")
    case _ => }
    rows.foreach { case (id, nTok, pos, sc, ec) =>
      assert(sc == pos / CurationQueries.PackBudget)
      assert(ec >= sc, s"doc $id")
      // a doc spans ceil(len/budget)+1 chunks at most
      assert(ec - sc <= nTok / CurationQueries.PackBudget + 1)
    }
  }

  test("q95: clip fractions track the percentiles; clipping pulls the mean inward") {
    val r = CurationQueries.winsorize(spark, sfDir).collect().head
    val n = r.getLong(0).toDouble
    val (lo, hi) = (r.getLong(1) / n, r.getLong(2) / n)
    // exact p01/p99 boundaries: ~1% clipped each side (interpolation ±1 row)
    assert(lo > 0 && lo <= 0.011, s"low clip fraction $lo")
    assert(hi > 0 && hi <= 0.011, s"high clip fraction $hi")
    assert(r.getDouble(3) < r.getDouble(4)) // p01 < p99
    // clipping a right-skewed price distribution moves the mean down, a little
    assert(math.abs(r.getDouble(6) - r.getDouble(5)) <
      0.05 * math.abs(r.getDouble(5)))
  }

  test("q109: group split never leaks; naive row split does; docs conserved") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val rows = CurationQueries.leakageSplit(spark, sfDir).collect()
    val docs = QueryUtil.table(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // each (source, lang) group sits wholly inside one split
    rows.foreach(r => assert(r.getLong(4) == 0L, s"leaked: $r"))
    // the row-id-keyed strawman provably leaks multi-doc groups
    assert(rows.head.getLong(5) > 0)
    // per-split group counts partition the group universe
    val nGroups = docs
      .select(concat(col("source"), lit("/"), col("lang"))).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nGroups)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    // train holds the bulk (80% of keyspace; small-group-count noise ok)
    val train = rows.find(_.getString(0) == "train").get.getLong(1).toDouble
    assert(train / rows.map(_.getLong(1)).sum > 0.6)
  }

  test("q110: bucketed padding beats global padding; integer invariants hold") {
    val rows = CurationQueries.lengthBatching(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val global = rows.find(_._1 == 0L).get
    val buckets = rows.filter(_._1 > 0L)
    assert(buckets.nonEmpty && buckets.forall(_._1 <= CurationQueries.BatchBucketCap))
    // the global row aggregates the buckets exactly
    assert(buckets.map(_._2).sum == global._2)
    assert(buckets.map(_._4).sum == global._4)
    assert(buckets.map(_._3).max == global._3)
    rows.foreach { case (b, n, pad, sum, waste, pm) =>
      assert(waste == n * pad - sum && waste >= 0, s"bucket $b")
      assert(pm == 1000L * waste / (n * pad), s"bucket $b")
      // non-terminal buckets pad at most to their bucket cap
      if (b > 0 && b < CurationQueries.BatchBucketCap)
        assert(pad <= b * CurationQueries.BatchBucketW)
    }
    // the whole point: pad-to-longest-in-bucket wastes far less than
    // pad-to-global-max
    val bucketedWaste = buckets.map(_._5).sum.toDouble
    assert(bucketedWaste < 0.5 * global._5,
      s"bucketed $bucketedWaste vs global ${global._5}")
  }

  test("q120: chunks tile every doc — spans cover, overlap fixed, hashes re-derivable") {
    import org.apache.spark.sql.functions.{col, trim, split}
    val rows = CurationQueries.ragChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val toks = QueryUtil.table(spark, sfDir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == toks.keySet)
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = toks(doc).length.toLong
      // chunk indices contiguous from 0; strides fixed; last chunk
      // reaches the end of the doc
      sorted.zipWithIndex.foreach { case ((_, ci, start, len, h), i) =>
        assert(ci == i && start == i * CurationQueries.ChunkStride)
        assert(len == math.min(CurationQueries.ChunkTok, n - start))
        val expectHash = java.security.MessageDigest.getInstance("MD5")
          .digest(toks(doc).slice(start.toInt, (start + len).toInt)
            .mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == expectHash, s"doc $doc chunk $ci")
      }
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $doc uncovered tail")
      // every consecutive pair overlaps by tok - stride (unless final
      // chunk is shorter)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == CurationQueries.ChunkStride)
        case _ =>
      }
    }
  }

  test("q96: row conservation — base − deletes + inserts") {
    val o = QueryUtil.table(spark, sfDir, "orders")
    import org.apache.spark.sql.functions.col
    val n = o.count()
    val k = col("o_orderkey")
    val nDel = o.filter(k % CurationQueries.CdcDelMod === 0).count()
    val nIns = o.filter(k % CurationQueries.CdcInsMod === 0).count()
    val got = CurationQueries.cdcApply(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == n - nDel + nIns)
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("F", "O", "P"))
  }

  test("q124: skip-gram head equals a driver-side recompute of the full pair table") {
    val rows = CurationQueries.skipgramPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val texts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val w = CurationQueries.SkipgramWindow.toInt
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    texts.foreach { t =>
      val a = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      for (i <- a.indices; j <- math.max(0, i - w) to math.min(a.length - 1, i + w)
           if j != i)
        pairs((a(i), a(j))) = pairs.getOrElse((a(i), a(j)), 0L) + 1L
    }
    val expected = pairs.toSeq.map { case ((c, x), n) => (c, x, n) }
      .sortBy { case (c, x, n) => (-n, c, x) }.take(CurationQueries.SkipgramTopK)
    assert(rows.toSeq == expected)
    // both directions of every co-occurrence are emitted
    assert(rows.nonEmpty && rows.forall { case (c, x, n) =>
      pairs.getOrElse((x, c), 0L) > 0 })
  }

  test("q130: PMI head equals a driver-side recompute; support floor holds") {
    val rows = CurationQueries.pmiCollocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val texts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val c12 = scala.collection.mutable.HashMap.empty[(String, String), Long]
    texts.foreach { t =>
      val a = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      a.sliding(2).foreach {
        case Array(x, y) => c12((x, y)) = c12.getOrElse((x, y), 0L) + 1L
        case _ =>
      }
    }
    val cl = c12.groupBy(_._1._1).map { case (w, m) => (w, m.values.sum) }
    val cr = c12.groupBy(_._1._2).map { case (w, m) => (w, m.values.sum) }
    val nb = c12.values.sum
    val expected = c12.toSeq
      .filter(_._2 >= CurationQueries.PmiMinCount)
      .map { case ((w1, w2), c) =>
        val pmi = math.round(1000000d *
          math.log((c * nb).toDouble / (cl(w1) * cr(w2)).toDouble))
        (w1, w2, c, pmi)
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(CurationQueries.PmiTopK)
    assert(rows.toSeq == expected)
    assert(rows.forall(_._3 >= CurationQueries.PmiMinCount))
    // collocations rank ABOVE chance pairings: the head is all-positive PMI
    assert(rows.forall(_._4 > 0))
  }

  test("q131: water-filling KKT invariants hold; both planner regimes present") {
    val rows = CurationQueries.mixPlanner(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 20)
    val budget = rows.head._7
    val r = rows.head._6
    assert(rows.forall(x => x._6 == r && x._7 == budget))
    val (capped, uncapped) = rows.partition(_._4)
    assert(capped.nonEmpty && uncapped.nonEmpty, "fixture must exercise both regimes")
    // KKT: capped sources contribute everything they have — and would
    // overflow their cap at the operative rate; uncapped fit under it
    capped.foreach { x =>
      assert(x._5 == x._2, s"${x._1} capped alloc")
      assert(r * x._3 / 1000000 >= x._2, s"${x._1} should not be capped")
    }
    uncapped.foreach { x =>
      assert(x._5 == r * x._3 / 1000000, s"${x._1} rate alloc")
      assert(x._5 <= x._2, s"${x._1} over-allocated")
    }
    // budget met up to integer-floor slack (one token per uncapped
    // source + one for the rate floor)
    val alloc = rows.map(_._5).sum
    assert(alloc <= budget)
    assert(budget - alloc <= uncapped.length + rows.map(_._3).sum / 1000000 + 1,
      s"slack ${budget - alloc}")
  }

  test("q136: negative draws equal the md5 inverse-CDF recompute; draws spread") {
    val rows = CurationQueries.negativeSampling(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    val texts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(CurationQueries.NegVocabK)
      .map { case (w, c) => (w, math.floor(math.sqrt(c.toDouble)).toLong) }
    val cdf = vocab.scanLeft(("", 0L, 0L)) { case ((_, _, hi), (w, wt)) =>
      (w, hi, hi + wt)
    }.tail
    val wTot = cdf.last._3
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = vocab.take(CurationQueries.NegCenters).flatMap { case (c, _) =>
      (1 to CurationQueries.NegK).map { j =>
        val t = h60(s"$c:neg:$j") % wTot
        val neg = cdf.find(e => t >= e._2 && t < e._3).get._1
        (c, j.toLong, neg, c == neg)
      }
    }.sortBy(r => (r._1, r._2))
    assert(rows.toSeq == expected)
    // the sampler must actually spread over the vocabulary
    assert(rows.map(_._3).distinct.length > 10)
    assert(rows.length ==
      CurationQueries.NegCenters * CurationQueries.NegK)
  }

  test("q125: streamed CDC merge lands on the batch snapshot exactly") {
    val stream = CurationQueries.streamCdcApply(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = CurationQueries.cdcApply(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("q143: epoch accounting is exact; quartiles balance; expansion is materialized") {
    val rows = CurationQueries.epochSchedule(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, reps, nDocs, tokOnce, nCopies, tokTotal, ck) =>
      // the materialized stream must carry exactly reps copies of each
      // doc and reps x the single-epoch token mass
      assert(nCopies == nDocs * reps, s"$src reps=$reps")
      assert(tokTotal == tokOnce * reps, s"$src reps=$reps")
      // the shuffle-key checksum only vanishes for the dropped cohort
      assert((reps == 0) == (ck == 0L) || reps > 0, s"$src reps=$reps ck=$ck")
      if (reps > 0) assert(ck > 0L, s"$src reps=$reps has empty checksum")
    }
    // every source has all four cohorts (4/2/1/0) with ntile-balanced
    // doc counts: sizes within a source differ by at most 1
    rows.groupBy(_._1).foreach { case (src, cohorts) =>
      assert(cohorts.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 4L), src)
      val sizes = cohorts.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src quartiles unbalanced: ${sizes.toSeq}")
    }
  }

  test("q154: DSIR selection report equals a driver-side recompute of the weights") {
    import CurationQueries.{DsirB, DsirTargetLang, DsirSelectDiv}
    val got = CurationQueries.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

    // bucket distributions + micronat log-ratios, exactly as specified
    val tokOf = (t: String) => t.trim.toLowerCase.split("\\s+").toSeq
    val bucketOf = (w: String) => graft.text.Hashing.h60Jvm(w) % DsirB
    val all = docs.flatMap(d => tokOf(d._4).map(w => (bucketOf(w), d._3)))
    val cr = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == DsirTargetLang).groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val (tr, tt) = (all.length.toLong,
      all.count(_._2 == DsirTargetLang).toLong)
    val lam = cr.keys.map { b =>
      val r = ((ct.getOrElse(b, 0L) + 1).toDouble * (tr + DsirB).toDouble) /
        ((tt + DsirB).toDouble * (cr(b) + 1).toDouble)
      b -> math.round(1000000d * math.log(r))
    }.toMap
    val scores = docs.map { d =>
      val s = tokOf(d._4).map(w => lam(bucketOf(w))).sum
      (d._1, d._2, d._3, s)
    }
    val k = docs.length / DsirSelectDiv
    val sel = scores.sortBy(s => (-s._4, s._1)).take(k)
      .map(s => (s._1, s._2, s._3)).toSet
    val want = scores.groupBy(s => (s._2, s._3)).map { case ((src, lg), ss) =>
      (src, lg, ss.length.toLong,
        ss.count(s => sel((s._1, s._2, s._3))).toLong,
        ss.map(_._4).sum,
        ss.filter(s => sel((s._1, s._2, s._3))).map(_._4).sum)
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // selection is real: k docs selected in total, target lang over-represented
    assert(got.map(_._4).sum == k)
    val selTarget = got.filter(_._2 == DsirTargetLang).map(_._4).sum.toDouble /
      got.map(_._4).sum
    val allTarget = got.filter(_._2 == DsirTargetLang).map(_._3).sum.toDouble /
      got.map(_._3).sum
    assert(selTarget >= allTarget * 0.8,
      s"selection did not track the target slice: $selTarget vs $allTarget")
  }

  test("q156: quotas are hit exactly and equal a driver-side hash-rank replay") {
    import CurationQueries.QuotaPm
    val got = CurationQueries.quotaSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.groupBy(_._2).map { case (lg, ds) =>
      val quota = ds.length.toLong * QuotaPm / 1000
      val sel = ds.map(d => (md5(s"${d._1}:q156"), d._1))
        .sortBy(identity).take(quota.toInt).map(_._2)
      (lg, ds.length.toLong, quota, sel.length.toLong, sel.sum,
        sel.map(id => graft.text.Hashing.x31Jvm(id.toString)).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    // the defining property vs q43: selected count EQUALS the quota
    got.foreach { r => assert(r._4 == r._3, s"${r._1} missed its quota") }
  }

  test("q163: span-corruption plan equals a driver-side replay of the draw") {
    import CurationQueries.{SpanLen, SpanMod, SpanHit}
    val got = CurationQueries.spanCorruption(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def maskedOf(id: Long, g: Long): Boolean =
      graft.text.Hashing.h60Jvm(s"$id:$g") % SpanMod < SpanHit
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      var (tok, spans, mSpans, mTok, sent, ck) = (0L, 0L, 0L, 0L, 0L, 0L)
      ds.foreach { case (id, _, text) =>
        val n = text.trim.toLowerCase.split("\\s+").length.toLong
        val nspans = (n - 1) / SpanLen + 1
        (0L until nspans).foreach { g =>
          val len = math.min(SpanLen.toLong, n - g * SpanLen)
          tok += len; spans += 1
          if (maskedOf(id, g)) {
            mSpans += 1; mTok += len
            if (g == 0 || !maskedOf(id, g - 1)) sent += 1
            ck += graft.text.Hashing.x31Jvm(s"$id:$g")
          }
        }
      }
      (src, ds.length.toLong, tok, spans, mSpans, mTok, (1000 * mTok) / tok,
        sent, ck)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    // the draw is a real ~15% plan: global rate inside [8%, 22%],
    // sentinels never exceed masked spans
    val (mt, t) = (got.map(_._6).sum, got.map(_._3).sum)
    assert(mt * 1000 / t > 80 && mt * 1000 / t < 220, s"rate ${mt * 1000 / t}")
    assert(got.forall(r => r._8 <= r._5 && r._5 <= r._4))
  }

  test("q172: novelty equals a driver-side shingle replay; near-dups score low") {
    import CurationQueries.{NovEvalMod, NovGramK}
    val got = CurationQueries.noveltyAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+")
      if (w.length < NovGramK) Set.empty
      else w.sliding(NovGramK).map(_.mkString(" ")).toSet
    }
    val trainSet = docs.filter(_._1 % NovEvalMod != 0)
      .flatMap(d => shingles(d._3)).toSet
    val want = docs.filter(_._1 % NovEvalMod == 0).map { d =>
      val sh = shingles(d._3)
      val novel = sh.count(s => !trainSet.contains(s)).toLong
      (d._1, d._2, sh.size.toLong, novel, 1000L * novel / sh.size)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // novelty must separate: most eval docs are fresh salad (high),
    // and at least the spread is non-trivial
    assert(got.map(_._5).max > 900)
  }

  test("q174: streamed novelty audit lands on the batch audit exactly") {
    val stream = CurationQueries.streamNoveltyAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val batch = CurationQueries.noveltyAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(stream.nonEmpty && stream.toSeq == batch.toSeq)
  }

  test("q180: JSD matrix equals a driver replay; bounds and coverage hold") {
    import CurationQueries.DsirB
    val rows = CurationQueries.sourceDivergence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues { ds =>
      val buckets = ds.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .map(w => graft.text.Hashing.h60Jvm(w) % DsirB)
      val counts = Array.fill(DsirB)(0L)
      buckets.foreach(b => counts(b.toInt) += 1)
      (counts, buckets.length.toLong)
    }.toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield {
      val (ca, ta) = bySrc(srcs(i))
      val (cb, tb) = bySrc(srcs(j))
      val jsd = (0 until DsirB).map { b =>
        val pa = (ca(b) + 1).toDouble / (ta + DsirB).toDouble
        val pb = (cb(b) + 1).toDouble / (tb + DsirB).toDouble
        math.round(1e6 * (0.5 * (pa * math.log(2 * pa / (pa + pb))
          + pb * math.log(2 * pb / (pa + pb)))))
      }.sum
      (srcs(i), srcs(j), jsd)
    }).sortBy(r => (r._1, r._2))
    assert(rows.toSeq == want)
    // full upper triangle; JSD in [~0, ln 2] micronats (+quantization slack)
    val n = srcs.length
    assert(rows.length == n * (n - 1) / 2)
    assert(rows.forall(r => r._3 >= -DsirB && r._3 <= 693148 + DsirB))
  }

  // ---- q220: exact-substring duplicate-span excision ------------------

  /** Driver-side reference: canonical-first redundant windows → merged
    * maximal spans. Mirrors the q220 contract exactly. */
  private def naiveExcision(docs: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val occ = for {
      (id, a) <- toks.toSeq; if a.size >= w
      p <- 1 to (a.size - w + 1)
    } yield (a.slice(p - 1, p + w - 1).mkString(" "), id, p)
    val red = occ.groupBy(_._1).values.flatMap { os =>
      if (os.size < 2) Nil else os.sortBy(o => (o._2, o._3)).tail
    }.toSeq
    docs.map { case (id, _) =>
      val ivs = red.filter(_._2 == id).map(o => (o._3, o._3 + w - 1))
        .sortBy(_._1)
      val merged = ivs.foldLeft(List.empty[(Int, Int)]) {
        case ((ps, pe) :: rest, (s, e)) if s <= pe + 1 =>
          (ps, math.max(pe, e)) :: rest
        case (acc, (s, e)) => (s, e) :: acc
      }.reverse
      val removed = merged.map { case (s, e) => e - s + 1 }.sum.toLong
      val ck = merged.map { case (s, e) => s.toLong * 1000003L + e }.sum
      val nTok = toks(id).size.toLong
      id -> (nTok, merged.size.toLong, removed, nTok - removed, ck)
    }.toMap
  }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_excise_").toFile
    dir.deleteOnExit()
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
    dir.getPath
  }

  test("q220: hand corpus — canonical first kept; overlap and adjacency merge") {
    val K = "a b c d e f g h" // the shared 8-gram; first occurrence in doc 0
    val docs = Seq(
      0L -> s"$K x y $K",            // within-doc repeat; first copy kept
      1L -> s"p q $K r",             // cross-doc repeat
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", // no duplication
      3L -> s"$K i",                 // holds the canonical first of 'b..i'
      4L -> s"z $K i",               // two overlapping redundant windows
      5L -> s"$K $K")                // adjacent spans coalesce to one
    val dir = writeDocs(docs)
    val got = CurationQueries.spanExcision(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val want = Map(
      0L -> (18L, 1L, 8L, 10L, 11L * 1000003 + 18),
      1L -> (11L, 1L, 8L, 3L, 3L * 1000003 + 10),
      2L -> (10L, 0L, 0L, 10L, 0L),
      3L -> (9L, 1L, 8L, 1L, 1L * 1000003 + 8),
      4L -> (10L, 1L, 9L, 1L, 2L * 1000003 + 10),
      5L -> (16L, 1L, 16L, 0L, 1L * 1000003 + 16))
    assert(got == want)
    assert(got == naiveExcision(docs, CurationQueries.PassageW))
  }

  test("q220: equals the driver-side reference on the real corpus") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = naiveExcision(docs, CurationQueries.PassageW)
    val got = CurationQueries.spanExcision(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // the corpus's injected near-duplicates guarantee real excisions
    assert(got.values.map(_._3).sum > 0)
  }

  // ---- q222: winnowing fingerprint selection --------------------------

  /** Driver-side winnowing: the exact (hash, rightmost-tie) selection
    * the engine encodes into its integer key. */
  private def naiveWinnow(docs: Seq[(Long, String)], k: Int, w: Int)
      : Map[Long, Set[Long]] =
    docs.map { case (id, t) =>
      val a = t.trim.toLowerCase.split("\\s+").toSeq
      val vs =
        if (a.size < k) Seq.empty[Long]
        else (1 to (a.size - k + 1)).map { p =>
          val h = graft.text.Hashing.h60Jvm(
            a.slice(p - 1, p + k - 1).mkString(" "))
          (h % graft.text.Winnowing.HashField) *
            graft.text.Winnowing.PosField +
            (graft.text.Winnowing.PosField - 1 - p)
        }
      val sel =
        if (vs.size < w) Set.empty[Long]
        else (0 to vs.size - w).map(i => vs.slice(i, i + w).min).toSet
      id -> sel
    }.toMap

  test("q222: equals the driver-side reference on the real corpus") {
    import graft.text.Winnowing
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = naiveWinnow(docs, CurationQueries.WinnowK,
      CurationQueries.WinnowW)
    val sel = Winnowing.selected(
        QueryUtil.table(spark, sfDir, "documents"), "doc_id", "text",
        CurationQueries.WinnowK, CurationQueries.WinnowW)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, ms) => id -> ms.map(_._2).toSet }
    assert(docs.map(d => d._1 -> sel.getOrElse(d._1, Set.empty[Long])).toMap
      == want)
    // the profile query agrees with the selected sets it aggregates
    val prof = CurationQueries.winnowFingerprints(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    want.foreach { case (id, s) =>
      assert(prof(id) == (s.size.toLong, s.map(_ % 1000000007L).sum)) }
    // winnowing density ~2/(w+1) = 0.4: corpus-wide mean in per-mille
    val rows = CurationQueries.winnowFingerprints(spark, sfDir).collect()
    val dens = 1000.0 * rows.map(_.getLong(2)).sum / rows.map(_.getLong(1)).sum
    assert(dens > 300 && dens < 500, s"density $dens permille")
  }

  test("q222: coverage guarantee — a shared run of w+k-1 tokens shares a fingerprint") {
    import graft.text.Winnowing
    val k = CurationQueries.WinnowK
    val w = CurationQueries.WinnowW
    // shared passage of exactly w+k-1 = 7 tokens, different contexts
    val passage = "s1 s2 s3 s4 s5 s6 s7"
    val docs = Seq(
      0L -> s"a1 a2 a3 $passage a4 a5 a6 a7 a8",
      1L -> s"b1 b2 b3 b4 b5 $passage b6 b7 b8",
      2L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12")
    val dir = writeDocs(docs)
    val sel = Winnowing.selected(
        QueryUtil.table(spark, dir, "documents"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1) / Winnowing.PosField))
      .groupBy(_._1).map { case (id, ms) => id -> ms.map(_._2).toSet }
    // Schleimer et al. Thm: any shared substring of >= w+k-1 tokens
    // forces at least one shared SELECTED hash
    assert((sel(0L) & sel(1L)).nonEmpty, "guarantee violated")
    assert((sel(0L) & sel(2L)).isEmpty && sel(1L).&(sel(2L)).isEmpty,
      "unrelated doc shares a fingerprint")
  }

  // ---- q236: clone localization from winnowed fingerprints -------------

  test("q236: localization equals a driver reference; spans cover the clone") {
    import graft.text.Winnowing
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val sel = naiveWinnow(docs, CurationQueries.WinnowK,
      CurationQueries.WinnowW)
    val occ = sel.toSeq.flatMap { case (id, ms) =>
      ms.map(m => (id, m / Winnowing.PosField,
        Winnowing.PosField - 1 - (m % Winnowing.PosField)))
    }
    val byH = occ.groupBy(_._2)
    val want = byH.values.flatMap { os =>
      for {
        (da, _, pa) <- os; (db, _, pb) <- os if da < db
      } yield ((da, db), (pa, pb))
    }.groupBy(_._1).collect {
      case (pair, hits) if hits.size >= CurationQueries.CloneMinShared =>
        val pas = hits.map(_._2._1); val pbs = hits.map(_._2._2)
        pair -> (hits.size.toLong, pas.min, pas.max, pbs.min, pbs.max)
    }.toMap
    val got = CurationQueries.cloneReport(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == want)
    // the synthetic near-dup twins guarantee reported clones, and the
    // match extents are sane gram positions
    assert(got.nonEmpty)
    got.values.foreach { case (_, aLo, aHi, bLo, bHi) =>
      assert(aLo >= 1 && aLo <= aHi && bLo >= 1 && bLo <= bHi)
    }
  }

  test("q236: a planted clone pair is found and its span localized") {
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val docs = Seq(
      0L -> s"a1 a2 a3 $passage a4 a5",
      1L -> s"b1 b2 b3 b4 b5 b6 b7 $passage",
      2L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14")
    val dir = writeDocs(docs)
    val got = CurationQueries.cloneReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.keySet == Set((0L, 1L)))
    val (n, aLo, aHi, bLo, bHi) = got((0L, 1L))
    assert(n >= CurationQueries.CloneMinShared)
    // the localized extents sit inside the planted passage on each side
    assert(aLo >= 4 && aHi <= 4 + 12 - 1)
    assert(bLo >= 8 && bHi <= 8 + 12 - 1)
  }

  // ---- q241: Gini concentration over sources ----------------------------

  test("q241: Gini equals a driver reference; extremes behave") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
    val per = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val sorted = per.toSeq.sortBy { case (s, x) => (x, s) }
    val n = sorted.size.toLong
    val tot = sorted.map(_._2).sum
    val ix = sorted.zipWithIndex.map { case ((_, x), i) => (i + 1) * x }.sum
    val wantG = 1000L * (2 * ix - (n + 1) * tot) / (n * tot)
    val row = CurationQueries.giniConcentration(spark, sfDir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == tot)
    assert(row.getLong(2) == wantG)
    // a near-balanced synthetic corpus sits low; bounds always hold
    assert(row.getLong(2) >= 0 && row.getLong(2) < 1000)
    // driver-side extremes of the same formula: equal masses -> 0;
    // one source holding everything -> (n-1)/n
    def gini(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val nn = s.size.toLong; val t = s.sum
      val sx = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      1000L * (2 * sx - (nn + 1) * t) / (nn * t)
    }
    assert(gini(Seq(5L, 5L, 5L, 5L)) == 0L)
    assert(gini(Seq(0L, 0L, 0L, 100L)) == 750L) // (n-1)/n = 3/4
  }

  // ---- q240: quality-score AUC against duplicate labels ----------------

  test("q240: AUC equals a brute force built from q10's and q14's own outputs") {
    val dupIds = graft.SparkEntry.queries("q10_dedup_minhash")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val scores = graft.SparkEntry.queries("q14_text_quality")(spark, sfDir)
      .selectExpr("doc_id", "cast(round(quality * 1e6) as long)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (dup, clean) = scores.partition(s => dupIds.contains(s._1))
    var u2 = 0L
    dup.foreach { case (_, a) => clean.foreach { case (_, b) =>
      if (a > b) u2 += 2 else if (a == b) u2 += 1 } }
    val (na, nb) = (dup.length.toLong, clean.length.toLong)
    val row = graft.queries.PipelineQueries.qualityAuc(spark, sfDir)
      .collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(row.getLong(2) == u2)
    assert(row.getLong(3) == (1000L * u2) / (2L * na * nb))
    // both classes populated; AUC a valid probability in per-mille
    assert(na > 0 && nb > 0)
    assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000)
  }

  // ---- q231: leave-one-source-out influence ----------------------------

  test("q231: LOO influence equals a driver-side reference; deltas conserve") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
    val nn = docs.length.toLong
    val ss = docs.map(_._2).sum
    val want = docs.groupBy(_._1).map { case (g, xs) =>
      val n = xs.size.toLong
      val s = xs.map(_._2).sum
      g -> (n, 1000L * s / n, 1000L * ss / nn,
        1000L * (ss - s) / (nn - n),
        1000L * ss / nn - 1000L * (ss - s) / (nn - n))
    }
    val got = CurationQueries.looInfluence(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // sanity: a source whose own mean exceeds the corpus mean has
    // non-negative influence, and vice versa (flooring can zero it but
    // never flip the sign)
    got.values.foreach { case (_, srcMean, corpusMean, _, infl) =>
      if (srcMean > corpusMean) assert(infl >= 0)
      if (srcMean < corpusMean) assert(infl <= 0)
    }
    // both signs actually occur on the real corpus
    assert(got.values.exists(_._5 > 0) && got.values.exists(_._5 < 0))
  }

  test("q256: Theil decomposition equals a driver replay; identity gap is quantization-sized") {
    val row = CurationQueries.theilDecomposition(spark, sfDir).collect().head
    val (nc, x, t, tb, tw, gap, share) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6))
    val cells = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "source", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val cc = cells.size.toLong
    val xx = cells.values.sum
    val grp = cells.groupBy(_._1._1)
      .map { case (l, g) => l -> (g.values.sum, g.size.toLong) }
    def q(v: Double): Long = math.round(1e6 * v)
    def sdiv(a: Long, b: Long): Long = if (a >= 0) a / b else -((-a) / b)
    val tnum = cells.values
      .map(m => m * q(math.log(m.toDouble * cc) - math.log(xx.toDouble))).sum
    val bnum = grp.values.map { case (mg, cg) =>
      mg * q(math.log(mg.toDouble * cc) - math.log(xx.toDouble * cg)) }.sum
    val wnum = cells.map { case ((l, _), m) =>
      val (mg, cg) = grp(l)
      m * q(math.log(m.toDouble * cg) - math.log(mg.toDouble)) }.sum
    assert((nc, x) == ((cc, xx)))
    assert((t, tb, tw) ==
      ((sdiv(tnum, xx), sdiv(bnum, xx), sdiv(wnum, xx))))
    assert(gap == t - (tb + tw))
    // Theil identity holds up to micronat quantization slack
    assert(math.abs(gap) <= 100L, s"gap $gap")
    assert(share == sdiv(1000L * tb, math.max(t, 1L)))
    // inequality exists and is non-negative up to quantization
    assert(t > 0 && tb >= -100 && tw >= -100)
  }

  test("q257: Pareto deciles equal a driver replay of the ordered cumsum") {
    val out = CurationQueries.paretoDeciles(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.map(_._1).toSeq == (1L to out.length).toSeq)
    val rev = QueryUtil.table(spark, sfDir, "orders")
      .groupBy(org.apache.spark.sql.functions.col("o_custkey"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(floor(o_totalprice * 100) as long))").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy { case (k, c) => (-c, k) }
    val n = sorted.length.toLong
    val total = sorted.map(_._2).sum
    var cum = 0L
    val rows = sorted.zipWithIndex.map { case ((_, c), i) =>
      cum += c; ((i.toLong * 10) / n + 1, i + 1L, cum) }
    val want = rows.groupBy(_._1).map { case (d, g) =>
      (d, g.map(_._2).max, g.map(_._3).max,
        1000L * g.map(_._3).max / total) }.toSeq.sortBy(_._1)
    assert(out.toSeq == want)
    // Lorenz curve properties: shares increase to exactly 1000,
    // customer counts to n
    assert(out.last._4 == 1000L && out.last._2 == n)
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted)
    // concentration exists: the top decile holds more than 10%
    assert(out.head._4 > 100L)
  }

  test("q261: Neyman allocation equals a driver replay and conserves the budget") {
    val out = CurationQueries.neymanAllocation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
    val per = docs.groupBy(_._1).map { case (s, g) =>
      val xs = g.map(_._2)
      val n = xs.length.toLong
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      (s, n, math.floor(math.sqrt((n * sxx - sx * sx).toDouble)).toLong)
    }.toSeq.sortBy(_._1)
    val w = per.map(_._3).sum
    val b = CurationQueries.NeymanBudget
    val based = per.map { case (s, n, wt) =>
      (s, n, wt, b * wt / math.max(w, 1L), b * wt % math.max(w, 1L)) }
    val leftover = b - based.map(_._4).sum
    val bump = based.sortBy { case (s, _, _, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    val want = based.map { case (s, n, wt, ba, _) =>
      (s, n, wt, ba, ba + (if (bump(s)) 1L else 0L)) }
    assert(out.toSeq == want)
    // the defining property floor-and-forget loses: exact conservation
    assert(out.map(_._5).sum == b)
    // volatile strata get at least their proportional floor
    assert(out.forall(r => r._5 >= r._4))
  }
}
