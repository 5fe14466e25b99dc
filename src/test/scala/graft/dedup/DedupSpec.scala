package graft.dedup

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.text.Hashing

/** Dedup operators vs brute-force ground truth on sf0.001 documents. */
class DedupSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").cache()

  /** Brute-force pairs with word-3-shingle Jaccard >= t. */
  private def bruteJaccardPairs(t: Double): Set[(Long, Long)] = {
    val sets = docs.select(col("doc_id"),
        Hashing.wordShingles(col("text"), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (a, b)).toSet
  }

  test("exact dedup: md5 groups count distinct texts") {
    val row = ExactDedup.stats(docs, "doc_id", "text").head()
    val nDocs = docs.count()
    val nDistinct = docs.select("text").distinct().count()
    assert(row.getAs[Long]("n_docs") == nDocs)
    assert(row.getAs[Long]("n_distinct") == nDistinct)
    assert(row.getAs[Long]("n_duplicates") == nDocs - nDistinct)
  }

  test("minhash LSH finds every brute-force pair at threshold 0.5") {
    val got = MinHashLSH.nearDuplicates(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteJaccardPairs(0.5)
    // exact-verify stage means zero false positives; LSH banding at
    // 16x2 makes false negatives ~1e-5 for j>=0.5 — assert equality
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("minhash est_jaccard tracks exact jaccard") {
    MinHashLSH.nearDuplicates(docs, "doc_id", "text", 0.5).collect().foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("jaccard")
      assert(math.abs(est - ex) < 0.35, s"est $est vs exact $ex")
    }
  }

  test("simhash near-dups: blocked result equals brute force") {
    val fp = SimHash.fingerprints(docs, "doc_id", "text").cache()
    val blocked = SimHash.nearDuplicates(fp, 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = fp.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (a, b, h)).toSet
    assert(blocked == brute, s"got ${blocked.size}, want ${brute.size}")
    fp.unpersist()
  }

  test("simhash skewed chunk: shared-chunk blowup is filtered before distinct") {
    // Adversarial skew fixture: 2048 fingerprints that ALL share chunk 0
    // (low 15 bits zero) — the chunk self-join alone yields ~2M
    // candidate rows. Payload bits encode the doc index in a 4x
    // repetition code, so pairwise hamming = 4*popcount(i^j) >= 4 > 3:
    // none survive the hamming filter except 5 planted exact twins.
    // The filter-before-distinct guard (SimHash.nearDuplicates) means
    // the distinct set holds 5 rows, not 2M — this test both proves the
    // result exact under skew and stays fast only because of the guard.
    val s = spark
    import s.implicits._
    def rep4(i: Int): Long = {
      var out = 0L
      var b = 0
      while (b < 11) {
        if (((i >> b) & 1) == 1) out |= 0xfL << (4 * b)
        b += 1
      }
      out
    }
    val base = (0 until 2048).map(i => (i.toLong, rep4(i) << 15))
    val twins = (0 until 5).map(j => (10000L + j, rep4(j) << 15))
    val fp = (base ++ twins).toDF("id", "simhash")
    val got = SimHash.nearDuplicates(fp, 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (0 until 5).map(j => (j.toLong, 10000L + j, 0)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("simhash fingerprints are 60-bit non-negative") {
    SimHash.fingerprints(docs, "doc_id", "text").collect().foreach { r =>
      val v = r.getAs[Long]("simhash")
      assert(v >= 0L && v < (1L << 60))
    }
  }

  test("ngram jaccard prefix-filter join equals brute force") {
    val got = NgramJaccard.similarPairs(docs, "doc_id", "text", 3, 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = docs.select(col("doc_id"),
        Hashing.charNgrams(col("text"), 3).as("g"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.7
    } yield (a, b)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("containment join finds quotes that symmetric jaccard misses") {
    val s = spark
    import s.implicits._
    val quoted = "the quick brown fox jumps over the lazy dog tonight"
    val big = quoted + " " + ("padding sentence with different words entirely " * 8)
    val corpus = Seq(
      (1L, quoted),                    // contained in 2
      (2L, big),                       // the (much larger) container
      (3L, "completely unrelated text about database engines instead"))
      .toDF("doc_id", "text")
    val res = NgramJaccard.containmentPairsResult(corpus, "doc_id", "text", 8, 0.6)
    val pairs = res.df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    res.release()
    // 1 is contained in 2 (containment ~1.0) but NOT vice versa...
    assert(pairs.exists { case (a, b, c) => a == 1L && b == 2L && c > 0.9 },
      pairs.toString)
    assert(!pairs.exists { case (a, b, _) => a == 2L && b == 1L }, pairs.toString)
    // ...and their symmetric jaccard is far below the same threshold
    val sym = NgramJaccard.similarPairsResult(corpus, "doc_id", "text", 8, 0.6)
    val symPairs = sym.df.collect()
    sym.release()
    assert(symPairs.isEmpty, symPairs.mkString(","))
  }

  test("containment filters never prune a true pair (100 random corpora)") {
    // the safety property of the asymmetric prefix + size + positional
    // filters: they may only discard NON-matches, so the candidate set
    // must be a superset of the brute-force truth on ANY corpus — here
    // 100 randomized corpora (planted quotes, shared fragments, noise)
    // unioned into one table and checked pair-exactly
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(97)
    val n = 5
    val tau = 0.6
    val corpus: Seq[(Long, String)] = (0 until 100).flatMap { c =>
      val vocab = Vector.tabulate(8)(k => s"w${c}x$k")
      def sent(len: Int) =
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val bases = Vector.fill(6)(sent(4 + rnd.nextInt(10)))
      val quotes = Vector.fill(4) {
        val b = bases(rnd.nextInt(bases.size))
        val frag = b.substring(0, math.max(n, rnd.nextInt(b.length)))
        if (rnd.nextBoolean()) frag + " " + sent(3) else sent(2) + " " + frag
      }
      (bases ++ quotes).zipWithIndex.map { case (t, i) => (c * 100L + i, t) }
    }
    val df = corpus.toDF("doc_id", "text")
    val (cand, _, scratch) =
      NgramJaccard.containmentCandidates(df, "doc_id", "text", n, tau)
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = NgramJaccard.containmentPairsResult(df, "doc_id", "text", n, tau)
    val outSet = out.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.release()
    scratch.foreach(_.unpersist(blocking = false))
    // brute-force truth over ALL ordered pairs, raw (unhashed) grams
    val grams: Array[(Long, Set[String])] = corpus.map { case (id, t) =>
      id -> (0 to t.length - n).map(i => t.substring(i, i + n)).toSet
    }.toArray
    val truth = (for {
      (a, ga) <- grams; (b, gb) <- grams
      if a != b && ga.intersect(gb).size.toDouble / ga.size >= tau
    } yield (a, b)).toSet
    assert(truth.size > 100, s"corpus planted only ${truth.size} true pairs")
    val pruned = truth -- candSet
    assert(pruned.isEmpty,
      s"filters pruned ${pruned.size} true pairs, e.g. ${pruned.take(5)}")
    assert(outSet == truth,
      s"verified output drifted: missing ${(truth -- outSet).take(5)}, " +
        s"extra ${(outSet -- truth).take(5)}")
    // pruning effectiveness, reported for the record
    val allPairs = corpus.size.toLong * (corpus.size - 1)
    info(f"candidates ${candSet.size}%,d of $allPairs%,d ordered pairs " +
      f"(${100.0 * candSet.size / allPairs}%.2f%%), ${truth.size}%,d true")
  }

  test("verify stages carry no forced corpus broadcast; release() frees scratch") {
    // The broadcast-vs-shuffle choice for the per-doc array tables must
    // stay with Catalyst/AQE (size-based), not be hard-coded: at 100 TB
    // a forced corpus broadcast is the scale-killer.
    val mh = MinHashLSH.nearDuplicatesResult(docs, "doc_id", "text", 0.5)
    val ng = NgramJaccard.similarPairsResult(docs, "doc_id", "text", 3, 0.7)
    val sh = SimHash.nearDuplicatesResult(docs, "doc_id", "text", 3)
    for ((name, res) <- Seq("minhash" -> mh, "ngram" -> ng, "simhash" -> sh)) {
      val opt = res.df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("strategy=broadcast"),
        s"$name verify join carries a broadcast hint:\n$opt")
      res.df.count() // materialize → scratch tables are now cached
      assert(res.cached.forall(_.storageLevel.useMemory ||
        res.cached.forall(_.storageLevel.useDisk)), s"$name scratch not persisted")
      res.release()
      assert(res.cached.forall(_.storageLevel == org.apache.spark.storage.StorageLevel.NONE),
        s"$name release() left scratch cached")
    }
  }

  test("h60 hashing matches the cross-engine contract") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592;
    // first 15 hex digits as decimal:
    val spark2 = spark
    import spark2.implicits._
    val v = Seq("hello").toDF("s")
      .select(Hashing.h60(col("s"))).head().getLong(0)
    assert(v == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(v == 419982666956583591L) // matches DuckDB ('0x'||...)::BIGINT
  }

  test("q263: calibration rows are arithmetically exact and cover q10's pairs") {
    import graft.queries.PipelineQueries
    val out = PipelineQueries.minhashCalibration(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9))))
    assert(out.nonEmpty)
    // arithmetic replay per candidate row
    for (((a, b), (m, inter, un, est, exact, err, se, within)) <- out) {
      assert(a < b)
      // a banding collision forces a full band of agreeing hashes
      assert(m >= MinHashLSH.RowsPerBand && m <= MinHashLSH.NumHashes.toLong)
      assert(inter >= 0 && inter <= un)
      assert(est == 1000L * m / 32 && exact == 1000L * inter / un)
      assert(err == est - exact)
      val seRef = math.floor(math.sqrt(
        (exact * (1000 - exact) / 32).toDouble)).toLong
      assert(se == seRef && within == (math.abs(err) <= 2 * seRef))
    }
    // the calibration table covers every pair q10 publishes, at
    // exactly q10's exact-jaccard level
    val q10 = PipelineQueries.dedupMinhash(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    val cal = out.toMap
    assert(q10.nonEmpty)
    for (((p, j)) <- q10) {
      assert(cal.contains(p), s"q10 pair $p missing from calibration")
      assert(cal(p)._5 == math.floor(j * 1000).toLong || {
        // rounding: q10's jaccard is round-6dp of inter/un; floors match
        val (_, inter, un, _, exact, _, _, _) = cal(p)
        exact == 1000L * inter / un
      })
    }
    // the estimator is well-calibrated on most candidates
    assert(out.count(_._2._8) * 10 >= out.length * 5)
  }
}
