package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{SparkEntry, SparkSpec}
import graft.queries.RetrievalQueries

/** What makes q192/q194/q195 INDEX-SERVED retrieval rather than
  * re-labeled corpus scans — invisible to the DuckDB oracle, whose SQL
  * is by design the full-scan formulation:
  *
  *  1. the token/position convention the store persists (1-based
  *     positions over the RAW split sequence, dropped short tokens
  *     still advance the counter) — the property that lets a disk
  *     index answer exact phrase adjacency;
  *  2. plan-level no-scan: the three query plans never touch
  *     documents.parquet, they read the published postings store, and
  *     the bucketed scan prunes to the query terms' buckets;
  *  3. score fidelity: index-served BM25 (q194) equals the full-scan
  *     q63 row-for-row;
  *  4. store lifecycle: a source-fingerprint change rebuilds the index
  *     and drops the superseded generation (IndexStore conventions).
  */
class InvertedIndexSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val tmpCorpora = scala.collection.mutable.Buffer[String]()

  override def afterAll(): Unit = {
    tmpCorpora.foreach(purgeDerivedStores)
    super.afterAll()
  }

  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other =>
          other.children.flatMap(unwrap) ++ other.subqueries.flatMap(unwrap)
      }
    unwrap(df.queryExecution.executedPlan)
  }

  private def scansOf(df: DataFrame, pathPart: String): Seq[FileSourceScanExec] =
    fileScans(df).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(pathPart)))

  /** Build the query's COLD plan: a subtree persisted by another suite
    * would otherwise be substituted as an InMemoryRelation, hiding the
    * file scans these tests assert on (and their pushed filters). */
  private def coldPlan(q: String): DataFrame = {
    spark.catalog.clearCache()
    SparkEntry.queries(q)(spark, sfDir)
  }

  // ---- 1. positional convention ----------------------------------------

  test("positions are 1-based over the raw split; dropped tokens advance the counter") {
    import spark.implicits._
    val docs = Seq((1L, "An apple a day... keeps the doctor away")).toDF("doc_id", "text")
    val rows = InvertedIndex.postingsDf(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Long](4)))
      .toMap
    // raw split of the lowercased text on [^a-z]+:
    //   an=1 apple=2 a=3 day=4 keeps=5 the=6 doctor=7 away=8
    // "an"/"a" are dropped by minTermLen=3 but still occupy positions —
    // so "apple day" is NOT adjacent (2 vs 4) while "keeps the" is (5, 6).
    assert(rows.keySet == Set("apple", "day", "keeps", "the", "doctor", "away"))
    assert(rows("apple")._3 == Seq(2L))
    assert(rows("day")._3 == Seq(4L))
    assert(rows("keeps")._3 == Seq(5L))
    assert(rows("the")._3 == Seq(6L))
    // dl counts only the indexed tokens (the BM25 length norm)
    assert(rows.values.forall { case (tf, dl, ps) => dl == 6L && tf == ps.size })
  }

  test("leading punctuation yields the same empty-token offset DuckDB's split sees") {
    import spark.implicits._
    val docs = Seq((1L, ",,alpha beta")).toDF("doc_id", "text")
    val rows = InvertedIndex.postingsDf(docs, "doc_id", "text", 3)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](4)).toMap
    // split gives ["", "alpha", "beta"]: the leading empty token holds
    // position 1, exactly like string_split_regex + generate_subscripts
    assert(rows("alpha") == Seq(2L) && rows("beta") == Seq(3L))
  }

  test("stats sidecar: n_docs counts ALL docs; avgdl averages docs with indexed tokens") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val s = InvertedIndex.statsDf(docs, "doc_id", "text", 3).head()
    assert(s.getDouble(0) == 3.0)          // token-less doc 3 still counts
    assert(s.getDouble(1) == 2.0)          // avg(3, 1) over docs 1 and 2
  }

  // ---- 2. plan-level no-scan + bucket pruning --------------------------

  private val IndexedQueries =
    Seq("q192_keyword_search", "q194_bm25_stored", "q195_phrase_search")

  test("q192/q194/q195 plans never scan documents.parquet; they read the postings store") {
    IndexedQueries.foreach { q =>
      val df = coldPlan(q)
      assert(scansOf(df, "documents.parquet").isEmpty,
        s"$q re-reads the corpus — not index-served")
      assert(scansOf(df, "graft_inv_idx_").nonEmpty,
        s"$q does not read the persisted inverted index")
    }
  }

  test("postings scans prune to the query terms' buckets") {
    val df = coldPlan("q192_keyword_search")
    val scans = scansOf(df, "graft_inv_idx_")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.relation.bucketSpec.exists(_.numBuckets == 8),
        s"postings scan lost the bucketed layout: $s")
      val pruned = s.optionalBucketSet
      assert(pruned.isDefined, "no bucket pruning on the term-filtered postings scan")
      assert(pruned.get.cardinality() <= RetrievalQueries.KeywordQuery.size,
        s"scan reads ${pruned.get.cardinality()} buckets for " +
          s"${RetrievalQueries.KeywordQuery.size} terms")
    }
  }

  // ---- 3. score fidelity ------------------------------------------------

  test("q194 index-served BM25 equals the full-scan q63 row-for-row") {
    val stored = SparkEntry.queries("q194_bm25_stored")(spark, sfDir).collect().toSeq
    val fullScan = SparkEntry.queries("q63_bm25")(spark, sfDir).collect().toSeq
    assert(stored.nonEmpty && stored == fullScan)
  }

  // ---- 4. segment append (q197) ----------------------------------------

  test("q197 appended-segment BM25 equals the full-scan q63 row-for-row") {
    val appended = SparkEntry.queries("q197_index_append")(spark, sfDir).collect().toSeq
    val fullScan = SparkEntry.queries("q63_bm25")(spark, sfDir).collect().toSeq
    assert(appended.nonEmpty && appended == fullScan)
  }

  test("q197 plan: no corpus scan; reads base AND appended segments") {
    val df = coldPlan("q197_index_append")
    assert(scansOf(df, "documents.parquet").isEmpty,
      "q197 re-reads the corpus — not index-served")
    assert(scansOf(df, "graft_inv_aidx_").exists(
      _.relation.location.rootPaths.exists(_.toString.contains("/base/"))),
      "plan does not read the base segment")
    assert(scansOf(df, "graft_inv_aidx_").exists(
      _.relation.location.rootPaths.exists(_.toString.contains("/appends/"))),
      "plan does not read the appended segment")
  }

  test("segment union equals a full single-segment rebuild; merged stats are exact") {
    import org.apache.spark.sql.functions.{col, sum}
    val (name, dest) = RetrievalQueries.appendIndexLocation(sfDir)
    RetrievalQueries.ensureAppendedInvertedIndex(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val key = (df: DataFrame) => df.orderBy("term", "doc_id").collect().toSeq
    val segments = spark.table(name)
      .unionByName(spark.read.parquet(s"$dest/appends/postings"))
    val rebuild = InvertedIndex.postingsDf(docs, "doc_id", "text", 3)
    assert(key(segments).nonEmpty && key(segments) == key(rebuild))
    val merged = spark.read.parquet(s"$dest/base/stats")
      .unionByName(spark.read.parquet(s"$dest/appends/stats"))
      .agg(sum(col("n_docs")), sum(col("n_indexed")), sum(col("sum_dl"))).head()
    val full = InvertedIndex.segmentStatsDf(docs, "doc_id", "text", 3).head()
    assert(merged.getLong(0) == full.getLong(0)
      && merged.getLong(1) == full.getLong(1)
      && merged.getLong(2) == full.getLong(2))
  }

  test("re-appending a lost delta segment never rewrites a base-segment file") {
    def fileState(d: File): Map[String, (Long, Long)] =
      Option(d.listFiles()).toSeq.flatten
        .filterNot(_.isDirectory)
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val (_, dest) = RetrievalQueries.appendIndexLocation(sfDir)
    val before = SparkEntry.queries("q197_index_append")(spark, sfDir).collect().toSeq
    val baseBefore = fileState(new File(dest, "base/postings"))
    assert(baseBefore.nonEmpty)
    // simulate a torn/lost append segment: delete it outright
    def deleteRec(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    deleteRec(new File(dest, "appends"))
    RetrievalQueries.ensureAppendedInvertedIndex(spark, sfDir)
    assert(IndexStore.hasSuccess(new File(dest, "appends/postings")),
      "append segment was not repaired")
    assert(fileState(new File(dest, "base/postings")) == baseBefore,
      "append pass rewrote base-segment files — segments must be immutable")
    val after = SparkEntry.queries("q197_index_append")(spark, sfDir).collect().toSeq
    assert(after == before)
  }

  // ---- 5. hybrid serving (q201) ----------------------------------------

  // ---- 5. streaming segment ingestion (q204) -----------------------------

  test("q204 stream-ingested BM25 equals the full-scan q63 row-for-row") {
    val ingested = SparkEntry.queries("q204_stream_index_ingest")(spark, sfDir)
      .collect().toSeq
    val fullScan = SparkEntry.queries("q63_bm25")(spark, sfDir).collect().toSeq
    assert(ingested.nonEmpty && ingested == fullScan)
  }

  test("q204 re-invocation is a no-op at BOTH layers: marker fast path and checkpoint") {
    val dest = RetrievalQueries.ensureStreamIngestedIndex(spark, sfDir)
    def snapshot(): Seq[(String, Long, Long)] =
      RetrievalQueries.segmentDirs(dest).flatMap { seg =>
        def walk(f: File): Seq[File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(seg).filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.length, f.lastModified))
      }.sortBy(_._1)
    val before = snapshot()
    assert(before.nonEmpty)
    // layer 1: the _INGESTED marker short-circuits stream startup
    RetrievalQueries.ensureStreamIngestedIndex(spark, sfDir)
    assert(snapshot() == before, "marker fast path rewrote segment files")
    // layer 2: without the marker, the CHECKPOINT makes the drained
    // stream a no-op — it starts, finds no uncommitted files, writes
    // nothing (the exactly-once property a restart relies on)
    assert(new File(dest, "_INGESTED").delete())
    RetrievalQueries.runIngestStream(spark, sfDir,
      "documents.parquet", 0, dest)
    assert(snapshot() == before,
      "checkpointed re-run rewrote committed segments — ingestion is not exactly-once")
    java.nio.file.Files.write(new File(dest, "_INGESTED").toPath,
      Array.emptyByteArray)
  }

  test("q204 multi-batch: one file per trigger yields one immutable segment per batch") {
    val dir = Files.createTempDirectory("graft_streamidx_").toFile
    dir.deleteOnExit()
    tmpCorpora += dir.getPath
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      Paths.get(dir.getPath, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // split the corpus into 3 single-file shards arriving as a stream
    val staging = new File(dir, "staging")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.repartition(3).write.parquet(staging.getPath)
    val parts = Option(staging.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.size == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p.toPath, Paths.get(dir.getPath, s"docpart_$i.parquet"))
    }
    val dest = RetrievalQueries.ensureStreamIngestedIndex(spark, dir.getPath,
      glob = "docpart_*.parquet", maxFilesPerTrigger = 1)
    val segs = RetrievalQueries.segmentDirs(dest)
    assert(segs.size == 3, s"expected 3 segments for 3 files, got ${segs.size}")
    // segment union ≡ a full single-segment rebuild of the same corpus
    val key = (df: DataFrame) => df.orderBy("term", "doc_id").collect().toSeq
    val union = segs.map(s => spark.read.parquet(s"${s.getPath}/postings"))
      .reduce(_.unionByName(_))
    val rebuild = InvertedIndex.postingsDf(
      docs, "doc_id", "text", graft.queries.ScaleQueries.MinTermLen)
    assert(key(union).nonEmpty && key(union) == key(rebuild))
    // mergeable stats sum to the exact full-corpus stats
    import org.apache.spark.sql.functions.{col, sum}
    val merged = segs.map(s => spark.read.parquet(s"${s.getPath}/stats"))
      .reduce(_.unionByName(_))
      .agg(sum(col("n_docs")), sum(col("n_indexed")), sum(col("sum_dl"))).head()
    val full = InvertedIndex.segmentStatsDf(
      docs, "doc_id", "text", graft.queries.ScaleQueries.MinTermLen).head()
    assert(merged.getLong(0) == full.getLong(0) &&
      merged.getLong(1) == full.getLong(1) && merged.getLong(2) == full.getLong(2))
  }

  test("q201 equals the full-scan q150 fusion row-for-row") {
    val stored = SparkEntry.queries("q201_hybrid_stored_search")(spark, sfDir)
      .collect().toSeq
    val fullScan = SparkEntry.queries("q150_rrf_fusion")(spark, sfDir)
      .collect().toSeq
    assert(stored.nonEmpty && stored == fullScan)
  }

  test("q201 plan: no corpus text scan; embeddings reads are delta or query only") {
    val df = coldPlan("q201_hybrid_stored_search")
    assert(scansOf(df, "documents.parquet").isEmpty,
      "q201 re-reads corpus text — the lexical side must serve from the postings store")
    assert(scansOf(df, "graft_inv_idx_").nonEmpty,
      "plan does not read the postings store")
    assert(scansOf(df, "graft_ivf_idx_").nonEmpty,
      "plan does not read the persisted IVF corpus")
    val embScans = scansOf(df, "embeddings.parquet")
    assert(embScans.nonEmpty, "expected delta/query scans of embeddings.parquet")
    embScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      val isDelta = filters.contains("% " + graft.queries.PipelineQueries.AnnDeltaMod) &&
        filters.contains("= 0")
      val isQuery = filters.contains("= " + graft.queries.ScaleQueries.RrfDenseQuery)
      assert(isDelta || isQuery,
        s"embeddings scan without delta/query predicate (base vectors re-read!): $s")
    }
  }

  // ---- 6. store lifecycle ----------------------------------------------

  test("inverted index rebuilds on source-fingerprint change, drops the old generation") {
    val dir = Files.createTempDirectory("graft_invidx_").toFile
    dir.deleteOnExit()
    tmpCorpora += dir.getPath
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      Paths.get(dir.getPath, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val name1 = RetrievalQueries.ensureInvertedIndex(spark, dir.getPath)
    val before = SparkEntry.queries("q192_keyword_search")(spark, dir.getPath)
      .collect().toSeq
    val dest1 = new File(sys.props("java.io.tmpdir"), s"graft_$name1")
    assert(IndexStore.hasSuccess(new File(dest1, "postings")))
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val name2 = RetrievalQueries.ensureInvertedIndex(spark, dir.getPath)
    assert(name2 != name1, "fingerprint change did not mint a new index generation")
    assert(!spark.catalog.tableExists(name1), "superseded catalog entry not dropped")
    assert(!dest1.exists(), "superseded store files not deleted")
    // same bytes -> rebuilt index answers identically
    val after = SparkEntry.queries("q192_keyword_search")(spark, dir.getPath)
      .collect().toSeq
    assert(after.nonEmpty && after == before)
  }
}
