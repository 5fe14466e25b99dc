package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CleaningQueriesSpec extends SparkSpec {

  test("q123: precedence picks the right winner per content group; checksums re-derivable") {
    val rows = CleaningQueries.canonicalDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySrc = rows.map(r => r._1 -> r).toMap
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toLong
    val nCc = docs.count(_._1 % 3 == 0).toLong
    val nWeb = docs.count(_._1 % 4 == 0).toLong

    // feed totals are the synthetic construction, exactly
    assert(bySrc("cc-main")._2 == nCc)
    assert(bySrc("web-dup")._2 == nWeb)
    assert(rows.filter(r => r._1 != "cc-main" && r._1 != "web-dup")
      .map(_._2).sum == nDocs)

    // priority 0 always wins: every cc-main copy is kept, none dropped
    assert(bySrc("cc-main")._3 == nCc && bySrc("cc-main")._4 == 0L)
    // priority 2 never beats an original: web-dup keeps nothing
    assert(bySrc("web-dup")._3 == 0L && bySrc("web-dup")._4 == nWeb)
    // an original survives iff no cc-main mirror of it exists
    rows.filter(r => r._1 != "cc-main" && r._1 != "web-dup").foreach { r =>
      val ids = docs.filter(_._2 == r._1).map(_._1)
      val keptIds = ids.filter(_ % 3 != 0)
      assert(r._3 == keptIds.length.toLong, s"${r._1} kept")
      assert(r._5 == keptIds.sum, s"${r._1} checksum")
    }
    // cc-main checksum = shifted ids of every %3 doc
    assert(bySrc("cc-main")._5 ==
      docs.filter(_._1 % 3 == 0).map(_._1 + CleaningQueries.CanonCcOffset).sum)
    // one winner per distinct content: kept total == distinct texts (corpus
    // texts are unique, so == nDocs)
    assert(rows.map(_._3).sum == nDocs)
  }

  test("q127: OOV audit equals a driver-side recompute; totals conserve") {
    val rows = CleaningQueries.vocabCoverage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val counts = docs.flatMap(d => toks(d._3)).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(CleaningQueries.VocabK).map(_._1).toSet
    val expected = docs.groupBy(_._2).map { case (lang, ds) =>
      val all = ds.flatMap(d => toks(d._3))
      val oov = all.count(w => !vocab.contains(w)).toLong
      (lang, ds.map(_._1).distinct.length.toLong, all.length.toLong, oov,
        1000L * oov / all.length)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == expected)
    // the corpus-derived vocab must actually cover the bulk of the corpus
    rows.foreach(r => assert(r._5 < 500, s"lang ${r._1} oov_pm ${r._5}"))
  }

  test("q140: card equals a driver-side recompute; dup column non-degenerate") {
    val rows = CleaningQueries.datasetCard(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    val overlay = docs ++ docs.filter(_._1 % 6 == 0)
    def nTok(t: String) = t.trim.split("\\s+").count(_.nonEmpty).toLong
    val perSrc = overlay.groupBy(_._2).map { case (s, ds) =>
      (s, ds.length.toLong, ds.map(_._3).distinct.length.toLong,
        ds.map(d => nTok(d._5)).sum, ds.map(_._4).sum,
        ds.length.toLong - ds.map(_._5).distinct.length.toLong)
    }
    val corpusTok = perSrc.map(_._4).sum
    val expected = perSrc.toSeq.map { case (s, n, nl, tok, ch, dup) =>
      (s, n, nl, tok, ch, dup, tok / n, 1000L * tok / corpusTok)
    }.sortBy(_._1)
    assert(rows.toSeq == expected)
    // the synthetic re-crawl makes the dup column fire: corpus-wide the
    // dup total is exactly the %6 cohort, and multiple sources carry it
    // (doc_id % 6 == 0 forces even ids, so odd-id sources honestly
    // report zero — the card distinguishes clean from dirty feeds)
    assert(rows.map(_._6).sum == docs.count(_._1 % 6 == 0).toLong)
    assert(rows.count(_._6 > 0) >= 5 && rows.exists(_._6 == 0))
    // shares partition the corpus (floor slack < #sources)
    val share = rows.map(_._8).sum
    assert(share <= 1000 && share > 1000 - rows.length)
  }

  test("q135: fit equals an exact driver-side recompute; flat salad is flagged as non-Zipfian") {
    val r = CleaningQueries.zipfFit(spark, sfDir).collect().head
    val (n, slope, intercept, r2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val texts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
    val spec = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(CleaningQueries.ZipfK).zipWithIndex
      .map { case ((_, c), i) =>
        (math.round(1000000d * math.log(i + 1d)),
          math.round(1000000d * math.log(c.toDouble)))
      }
    assert(n == spec.length.toLong)
    val nn = BigInt(spec.length)
    val sx = spec.map(p => BigInt(p._1)).sum
    val sy = spec.map(p => BigInt(p._2)).sum
    val sxy = spec.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = spec.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = spec.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val beta = (nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx).toDouble
    assert(slope == math.round(1000000d * beta))
    assert(intercept ==
      math.round((sy.toDouble - beta * sx.toDouble) / nn.toDouble))
    val r2d = ((nn * sxy - sx * sy).toDouble * (nn * sxy - sx * sy).toDouble /
      ((nn * sxx - sx * sx).toDouble * (nn * syy - sy * sy).toDouble))
    assert(r2 == math.floor(1000d * r2d).toLong)
    // frequency decreases with rank → slope negative; and the salad
    // corpus must NOT pass for natural language (|s| ≪ 1, weak fit)
    assert(slope < 0 && slope > -1000000)
    assert(r2 >= 0 && r2 < 900)
  }

  test("q151: checkpoints equal an exact driver-side recompute of V(T)") {
    import CleaningQueries.HeapsK
    val rows = CleaningQueries.heapsFit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == (1L to HeapsK))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0))
      .map(_.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val n = docs.length.toLong
    rows.foreach { case (j, nDocs, cumTok, cumVoc, _, _, _) =>
      assert(nDocs == (n * j + HeapsK - 1) / HeapsK)
      val prefix = docs.take(nDocs.toInt)
      assert(cumTok == prefix.map(_.length.toLong).sum, s"ckpt $j tokens")
      assert(cumVoc == prefix.flatten.distinct.length.toLong, s"ckpt $j vocab")
    }
    // monotone growth, and the fit columns are constant across rows
    assert(rows.sliding(2).forall(p => p(1)._3 >= p(0)._3 && p(1)._4 >= p(0)._4))
    assert(rows.map(r => (r._5, r._6, r._7)).distinct.length == 1)
  }

  test("q151: the OLS recovers beta on a synthetic open-vocabulary corpus") {
    // V(T) here grows as a power law by construction: doc i contributes
    // words w_{k} for k in [0, floor((i+1)^0.5 * 8)), 20 tokens each
    import spark.implicits._
    val docs = (0 until 64).map { i =>
      val vocabTop = math.floor(math.sqrt(i + 1d) * 8).toInt
      val words = (0 until 20).map(t => s"w${(i * 7 + t * 13) % vocabTop}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CleaningQueries.heapsFit(spark, dir).collect().head
    val beta = r.getLong(4)
    val r2 = r.getLong(6)
    // sublinear open-vocabulary growth: 0 < beta < 1, strong fit
    assert(beta > 100000 && beta < 900000, s"beta_micro=$beta")
    assert(r2 > 800, s"r2_pm=$r2")
  }

  test("q153: line classes partition lines_in and equal a driver-side replay") {
    import CleaningQueries.{C4LineW, C4MinWords}
    val rows = CleaningQueries.c4LineFilter(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    assert(rows.nonEmpty)
    // classes partition; every rule fires somewhere on the fixture
    rows.foreach { case (_, _, _, in, ban, nop, sh, kept, _, _) =>
      assert(ban + nop + sh + kept == in)
    }
    assert(rows.map(_._5).sum > 0 && rows.map(_._6).sum > 0 &&
      rows.map(_._7).sum > 0 && rows.map(_._8).sum > 0 &&
      rows.map(_._3).sum > 0)

    // driver-side replay of the overlay + rules
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      var (docsIn, docsLorem, linesIn, ban, nop, sh, kept, chars, sum31) =
        (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      ds.foreach { case (id, _, text) =>
        docsIn += 1
        val w = text.trim.split("\\s+")
        val nl = (w.length - 1) / C4LineW + 1
        val lorem = (0 until nl).exists(li => (id * 31 + li) % 17 == 1)
        if (lorem) docsLorem += 1
        else (0 until nl).foreach { li =>
          linesIn += 1
          val chunk = w.slice(li * C4LineW, li * C4LineW + C4LineW).mkString(" ")
          val h = (id * 31 + li) % 17
          val line =
            if (h == 0) "click here to enable javascript and cookies in your browser."
            else if (h == 1) sys.error("unreachable")
            else if ((id + li) % 3 != 0) chunk + "." else chunk
          val banned = line.contains("javascript") || line.contains("cookie")
          val punct = ".!?".contains(line.last)
          val nw = line.split(" ").length
          if (banned) ban += 1
          else if (!punct) nop += 1
          else if (nw < C4MinWords) sh += 1
          else {
            kept += 1; chars += line.length
            sum31 += graft.text.Hashing.x31Jvm(s"$line:$id")
          }
        }
      }
      (src, docsIn, docsLorem, linesIn, ban, nop, sh, kept, chars, sum31)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == want)
  }

  test("q155: NFC audit equals a driver-side Normalizer replay; controls hold") {
    val rows = CleaningQueries.nfcAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      var (nd, nn, cr, cn, ck) = (0L, 0L, 0L, 0L, 0L)
      ds.foreach { case (id, _, text) =>
        nd += 1
        val t = (id % 4) match {
          case 0 => text.replace("a", "a\u0301")
          case 1 => text.replace("e", "\u00e9")
          case _ => text
        }
        val n = graft.functions.Unicode.nfc(t)
        if (n != t) nn += 1
        cr += t.codePointCount(0, t.length)
        cn += n.codePointCount(0, n.length)
        ck += graft.text.Hashing.x31Jvm(s"$n:$id")
      }
      (src, nd, nn, cr, cn, ck)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == want)
    // the decomposed cohort is flagged, the precomposed cohort is NOT,
    // and composition shrank exactly the flagged docs' combining marks
    assert(rows.map(_._3).sum ==
      docs.count(d => d._1 % 4 == 0 && d._3.contains("a")))
    assert(rows.map(r => r._4 - r._5).sum > 0)
  }

  test("q158: diversity indices equal a driver-side recompute from token shares") {
    val r = CleaningQueries.mixDiversity(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
    val per = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(x => (x.getString(0),
        x.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tt = per.values.sum
    val ns = per.size.toLong
    val h = per.values.map(t => math.round(1e6 *
      ((t.toDouble / tt.toDouble) * math.log(tt.toDouble / t.toDouble)))).sum
    val simpson = per.values.map(t => math.round(1e9 *
      ((t.toDouble / tt.toDouble) * (t.toDouble / tt.toDouble)))).sum
    val ranked = per.toSeq.sortBy { case (s, t) => (t, s) }.zipWithIndex
    val gnum = ranked.map { case ((_, t), i) => (2L * (i + 1) - ns - 1) * t }.sum
    val eff = math.round(1000d * math.exp(h.toDouble / 1e6))
    assert(got == (ns, tt, h, eff, simpson, (1000 * gnum) / (ns * tt)))
    // sanity: entropy within [0, ln ns]; effective sources within [1, ns]
    assert(h >= 0 && h <= math.round(1e6 * math.log(ns.toDouble)) + ns)
    assert(eff >= 1000 && eff <= ns * 1000)
  }

  test("q169: nucleus sizes equal a driver recompute and are minimal") {
    val got = CleaningQueries.nucleusCoverage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (lang, ds) =>
      val counts = ds.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }
      val tot = counts.map(_._2).sum
      var (cum, nucleus) = (0L, 0L)
      counts.foreach { case (_, c) =>
        if (10 * cum < 9 * tot) nucleus += 1
        cum += c
      }
      val top10 = counts.take(10).map(_._2).sum
      (lang, counts.length.toLong, tot, nucleus, 1000 * top10 / tot)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    // minimality: nucleus-1 words cover < 90%, nucleus words cover >= 90%
    got.foreach { case (lang, v, t, n, _) =>
      val counts = docs.filter(_._1 == lang)
        .flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.map(_._2)
      assert(10 * counts.take(n.toInt).sum >= 9 * t, s"$lang under-covers")
      if (n > 1) assert(10 * counts.take(n.toInt - 1).sum < 9 * t,
        s"$lang nucleus not minimal")
      assert(n <= v)
    }
  }

  test("q170: calibration bins and ECE equal a driver recompute") {
    val got = CleaningQueries.calibrationAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val stop = graft.text.TextStats.stopwords.toSet
    val scored = docs.map { case (lang, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val pm = 1000L * toks.count(stop) / toks.length
      (math.min(9L, pm / 100), pm, if (lang == "en") 1L else 0L)
    }
    val bins = scored.groupBy(_._1).map { case (b, xs) =>
      val n = xs.length.toLong
      val mean = xs.map(_._2).sum / n
      val rate = 1000L * xs.map(_._3).sum / n
      (b, n, mean, rate, math.abs(mean - rate))
    }.toSeq.sortBy(_._1)
    val ece = bins.map(x => x._2 * x._5).sum / bins.map(_._2).sum
    assert(got.toSeq == bins.map(b => (b._1, b._2, b._3, b._4, b._5, ece)))
    // the audit is non-degenerate: >1 bin, ECE strictly positive
    assert(got.length > 1 && ece > 0)
  }

  test("q237: Luhn separates the planted valid/invalid twins exactly") {
    // driver-side Luhn over the constants proves the fixtures
    def luhnOk(num: String): Boolean = {
      val s = num.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
      s % 10 == 0
    }
    assert(CleaningQueries.LuhnValid.forall(luhnOk))
    assert(!CleaningQueries.LuhnInvalid.exists(luhnOk))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).map { case (src, xs) =>
      val nValid = xs.count(_._1 % 4 == 0).toLong
      val nInvalid = xs.count(_._1 % 4 == 1).toLong
      val nCands = nValid + nInvalid
      src -> (xs.size.toLong, nCands, nValid, nInvalid,
        if (nCands > 0) 1000L * nValid / nCands else 0L)
    }
    val got = CleaningQueries.luhnAudit(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // the regex alone cannot separate: corpus-wide, candidates strictly
    // exceed checksum-valid hits and both classes are populated
    val (cands, valids) = (got.values.map(_._2).sum, got.values.map(_._3).sum)
    assert(cands > valids && valids > 0)
  }

  test("q246: Good-Turing spectrum equals a driver replay of the token counts") {
    val out = CleaningQueries.goodTuring(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    // independent replay: bigram counts -> frequency-of-frequencies
    val termCounts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect()
      .flatMap { r =>
        val a = r.getString(0).trim.toLowerCase.split("\\s+")
        a.iterator.zip(a.iterator.drop(1)).map { case (x, y) => s"$x $y" }
      }
      .groupBy(identity).map { case (_, v) => v.size.toLong }
    val fof = termCounts.groupBy(identity)
      .map { case (r, v) => r -> v.size.toLong }
    val nTotal = termCounts.sum
    val n1 = fof.getOrElse(1L, 0L)
    for ((r, nr, mass, rStar, p0) <- out) {
      assert(r >= 1 && r <= CleaningQueries.GtMaxR)
      assert(nr == fof(r), s"r=$r n_r")
      assert(mass == r * nr, s"r=$r mass")
      assert(rStar == 1000L * (r + 1) * fof.getOrElse(r + 1, 0L) / nr, s"r=$r r*")
      assert(p0 == 1000L * n1 / nTotal, s"r=$r p0")
    }
    // every small-r spectrum row present; singletons exist in any real corpus
    assert(out.map(_._1).toSet == fof.keySet.filter(_ <= CleaningQueries.GtMaxR))
    assert(n1 > 0 && out.head._1 == 1L)
    // Good-Turing discounts singletons below their raw count
    assert(out.head._4 < 2000L)
  }

  test("q247: readability audit equals a driver replay of the count fold") {
    val out = CleaningQueries.readabilityAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(out.map(_._1).toSeq == bySource.keys.toSeq.sorted)
    for ((src, (nDocs, words, syls, wpd, spw, fk, fl)) <- out) {
      val texts = bySource(src).map(_._2)
      val w = texts.map(_.trim.toLowerCase.split("\\s+").length.toLong).sum
      val y = texts.map(t =>
        "[aeiouy]+".r.findAllIn(t.toLowerCase).size.toLong).sum
      assert(nDocs == texts.length.toLong, s"$src n_docs")
      assert((words, syls) == ((w, y)), s"$src counts")
      assert(wpd == 1000L * w / nDocs && spw == 1000L * y / w, s"$src ratios")
      assert(fk == 390L * w / nDocs + 11800L * y / w - 15590L, s"$src fk")
      assert(fl == 206835L - 1015L * w / nDocs - 84600L * y / w, s"$src flesch")
      // word-soup corpus: at least one syllable-bearing token per word
      // group on average would be extreme; just pin validity bounds
      assert(y > 0 && w > 0 && spw >= 1000L, s"$src degenerate counts")
    }
  }

  test("q251: Brier decomposition equals a driver replay; identity gap is quantization-sized") {
    import graft.text.TextStats
    val row = CleaningQueries.brierDecomposition(spark, sfDir).collect().head
    val (n, obar, bs, rel, res, unc, gap) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6))
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map { r =>
        val ws = r.getString(1).trim.toLowerCase.split("\\s+")
        val f = 1000L * ws.count(TextStats.stopwords.contains) / ws.length
        (f, if (r.getString(0) == "en") 1L else 0L)
      }
    val cells = docs.groupBy(_._1).map { case (f, g) =>
      (f, g.size.toLong, g.map(_._2).sum) }
    val nn = docs.length.toLong
    val kk = docs.map(_._2).sum
    val obarRef = 1000L * kk / nn
    val relRef = cells.map { case (f, c, k) =>
      val o = 1000L * k / c; c * (f - o) * (f - o) }.sum / nn
    val resRef = cells.map { case (_, c, k) =>
      val o = 1000L * k / c; c * (o - obarRef) * (o - obarRef) }.sum / nn
    val bsRef = cells.map { case (f, c, k) =>
      k * (f - 1000) * (f - 1000) + (c - k) * f * f }.sum / nn
    assert((n, obar) == ((nn, obarRef)))
    assert((bs, rel, res) == ((bsRef, relRef, resRef)))
    assert(unc == obarRef * (1000 - obarRef))
    assert(gap == bs - (rel - res + unc))
    // Murphy's identity holds up to the documented per-cell/per-N floors:
    // each of the four terms drops < 1 micro per cell plus the o_pm floor
    assert(math.abs(gap) <= 2000L, s"gap $gap too large for quantization")
    // both classes present, so uncertainty is strictly positive
    assert(unc > 0 && res >= 0 && rel >= 0 && bs > 0)
  }

  test("q266: vocabulary growth equals a driver replay; curve conserves the vocabulary") {
    val out = CleaningQueries.vocabGrowth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq == (0L until CleaningQueries.GrowthSlices))
    val bgs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val a = r.getString(1).trim.toLowerCase.split("\\s+")
        val slice = r.getLong(0) % CleaningQueries.GrowthSlices
        a.iterator.zip(a.iterator.drop(1)).map { case (x, y) =>
          (slice, s"$x $y") }
      }
    val firstSeen = bgs.groupBy(_._2).map { case (_, g) => g.map(_._1).min }
    val newBy = firstSeen.groupBy(identity)
      .map { case (s, g) => s -> g.size.toLong }.withDefaultValue(0L)
    val massBy = bgs.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var cum = 0L
    for ((slice, mass, nt, ct, pm) <- out) {
      assert(mass == massBy(slice), s"slice $slice mass")
      assert(nt == newBy(slice), s"slice $slice new")
      cum += nt
      assert(ct == cum, s"slice $slice cum")
      assert(pm == 1000L * nt / mass, s"slice $slice rate")
    }
    // the curve ends at exactly the corpus bigram vocabulary, and
    // novelty decays: the last slice sees fewer new types than the first
    assert(cum == bgs.map(_._2).distinct.length.toLong)
    assert(out.last._3 < out.head._3)
  }
}
