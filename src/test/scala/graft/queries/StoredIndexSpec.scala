package graft.queries

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{SparkEntry, SparkSpec}
import graft.sources.IndexStore

/** The properties that make q184/q185 STORED-INDEX operators rather
  * than re-labeled recomputes — none of which the DuckDB oracle can
  * see, because a silent recompute-from-source produces bitwise
  * identical output:
  *
  *  1. row-for-row equality with the recompute paths (q184 ≡ q81,
  *     q185 ≡ q108) — the stored columns are deterministic per-doc
  *     functions of the source, so a correct store changes nothing;
  *  2. plan-level no-recompute: every source scan in the query plan
  *     carries the delta (or query-vector) predicate — base text /
  *     base embeddings are never re-read — and the plan reads the
  *     on-disk index;
  *  3. store lifecycle ([[graft.sources.IndexStore]]): content
  *     fingerprints change when any contained data file changes (the
  *     directory-backed in-place-overwrite trap), a fingerprint change
  *     rebuilds the index and deletes the superseded generation, and a
  *     half-written store (no `_SUCCESS`) is rebuilt, not served.
  */
class StoredIndexSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private def rows(q: String, dir: String = sfDir) =
    SparkEntry.queries(q)(spark, dir).collect().toSeq

  /** Every FileSourceScanExec in the (AQE-unwrapped) physical plan —
    * INCLUDING scans inside persisted scratch subtrees: the dedup
    * screens eagerly materialize their signature/pair scratch (round-12
    * cache-race fix), so the executed plan substitutes
    * InMemoryTableScans whose cachedPlan holds the file scans this spec
    * asserts on. A scan hidden behind a cache is still a scan the query
    * pays on a cold run, so the no-recompute property must hold there
    * too. */
  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        // executed cached plans wrap their subtrees in QueryStageExec
        // LEAVES (children = Nil); descend through the wrapped plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          unwrap(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          unwrap(m.relation.cachedPlan) ++
            m.children.flatMap(unwrap) ++ m.subqueries.flatMap(unwrap)
        case other =>
          other.children.flatMap(unwrap) ++
            other.subqueries.flatMap(unwrap)
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

  // ---- 1. equality with the recompute paths ---------------------------

  test("q184 equals q81's recompute path row-for-row") {
    val stored = rows("q184_dedup_stored_index")
    val recompute = rows("q81_dedup_incremental")
    assert(stored.nonEmpty && stored == recompute)
  }

  test("q185 equals q108's recompute path row-for-row") {
    val stored = rows("q185_ann_stored_index")
    val recompute = rows("q108_ann_incremental")
    assert(stored.nonEmpty && stored == recompute)
  }

  // ---- 2. plan-level no-recompute --------------------------------------

  test("q184 plan: every documents scan carries the delta predicate; index read from disk") {
    val df = coldPlan("q184_dedup_stored_index")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected delta scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% 10") && filters.contains("= 0"),
        s"documents scan without the delta predicate (base text re-read!): $s")
    }
    assert(scansOf(df, "graft_dedup_idx_").nonEmpty,
      "plan does not read the persisted dedup index")
  }

  test("q185 plan: every embeddings scan is delta or query vectors; index read from disk") {
    val df = coldPlan("q185_ann_stored_index")
    val embScans = scansOf(df, "embeddings.parquet")
    assert(embScans.nonEmpty, "expected delta/query scans of embeddings.parquet")
    embScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      val isDelta = filters.contains("% 4") && filters.contains("= 0")
      val isQueries = filters.contains("< " + PipelineQueries.KnnQueries)
      assert(isDelta || isQueries,
        s"embeddings scan without delta/query predicate (base vectors re-read!): $s")
    }
    assert(scansOf(df, "graft_ivf_idx_").nonEmpty,
      "plan does not read the persisted IVF corpus")
  }

  // ---- 3. store lifecycle ----------------------------------------------

  private val tmpCorpora = scala.collection.mutable.Buffer[String]()

  override def afterAll(): Unit = {
    // test corpora mint never-repeating path tags — purge their derived
    // stores or every suite run leaks orphaned generations into tmpdir
    tmpCorpora.foreach(purgeDerivedStores)
    super.afterAll()
  }

  private def tmpCorpus(tables: String*): String = {
    val d = Files.createTempDirectory("graft_storedindex_").toFile
    tmpCorpora += d.getPath
    d.deleteOnExit()
    tables.foreach { t =>
      Files.copy(Paths.get(s"$sfDir/$t.parquet"),
        Paths.get(d.getPath, s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    d.getPath
  }

  test("contentTag sees an in-place overwrite inside a directory-backed dataset") {
    val root = Files.createTempDirectory("graft_fp_").toFile
    tmpCorpora += root.getPath
    val ds = new File(root, "documents.parquet")
    assert(ds.mkdir())
    val part = new File(ds, "part-00000.parquet")
    Files.write(part.toPath, Array[Byte](1, 2, 3))
    assert(part.setLastModified(1000000000000L))
    assert(ds.setLastModified(2000000000000L))
    val before = IndexStore.contentTag(ds)
    // in-place overwrite: same file name, same length, newer mtime —
    // and the DIRECTORY's own mtime pinned back to its old value
    Files.write(part.toPath, Array[Byte](9, 9, 9))
    assert(part.setLastModified(1500000000000L))
    assert(ds.setLastModified(2000000000000L))
    assert(IndexStore.contentTag(ds) != before,
      "fingerprint missed an in-place data-file overwrite")
  }

  test("q184 rebuilds on source-fingerprint change and drops the superseded generation") {
    val dir = tmpCorpus("documents")
    val name1 = PipelineQueries.ensureDedupIndex(spark, dir)
    assert(spark.catalog.tableExists(name1))
    val dest1 = new File(sys.props("java.io.tmpdir"), s"graft_$name1")
    assert(IndexStore.hasSuccess(dest1), s"no published store at $dest1")
    // regenerate the source: content changes -> new fingerprint tag
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val name2 = PipelineQueries.ensureDedupIndex(spark, dir)
    assert(name2 != name1, "fingerprint change did not mint a new index generation")
    assert(spark.catalog.tableExists(name2))
    val dest2 = new File(sys.props("java.io.tmpdir"), s"graft_$name2")
    assert(IndexStore.hasSuccess(dest2))
    // superseded generation: catalog entry dropped, files deleted
    assert(!spark.catalog.tableExists(name1), "superseded catalog entry not dropped")
    assert(!dest1.exists(), "superseded store files not deleted")
    // and the rebuilt index answers the query identically to recompute
    assert(rows("q184_dedup_stored_index", dir) == rows("q81_dedup_incremental", dir))
  }

  test("a half-written store (no _SUCCESS) is rebuilt, not served") {
    val dir = tmpCorpus("documents")
    val dirTag = IndexStore.pathTag(dir)
    val fpTag = IndexStore.contentTag(new File(dir, "documents.parquet"))
    val dest = new File(sys.props("java.io.tmpdir"),
      s"graft_dedup_idx_${dirTag}_$fpTag")
    // simulate a builder that died mid-write: files exist, no _SUCCESS
    assert(dest.mkdirs())
    Files.write(new File(dest, "part-00000-dead.parquet").toPath,
      Array[Byte](0, 0, 0, 0))
    val name = PipelineQueries.ensureDedupIndex(spark, dir)
    assert(IndexStore.hasSuccess(dest), "half-written store was not replaced")
    assert(!new File(dest, "part-00000-dead.parquet").exists(),
      "garbage from the dead builder survived the publish")
    assert(spark.catalog.tableExists(name))
    assert(rows("q184_dedup_stored_index", dir) == rows("q81_dedup_incremental", dir))
  }

  // ---- 4. compaction (q188) ---------------------------------------------

  test("q188: compaction collapses the append pile into the bucketed layout") {
    val dir = tmpCorpus("documents")
    val name = PipelineQueries.ensureCompactedIndex(spark, dir)
    val dest = new File(sys.props("java.io.tmpdir"), s"graft_$name")
    def dataFiles(d: File): Int =
      Option(d.listFiles()).toSeq.flatten
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val nFrag = dataFiles(new File(dest, "fragments"))
    val nCompact = dataFiles(new File(dest, "compacted"))
    assert(nFrag >= 2 * PipelineQueries.CompactFragments,
      s"append pile not fragmented enough to exercise compaction ($nFrag files)")
    assert(nCompact <= 8, s"compacted layout has $nCompact files (want ≤ 8 buckets)")
    assert(nFrag >= 2 * nCompact, s"no file-count collapse: $nFrag -> $nCompact")
  }

  test("q188: compacted result equals the fragmented store's and the recompute path") {
    val dir = tmpCorpus("documents")
    val name = PipelineQueries.ensureCompactedIndex(spark, dir)
    val dest = new File(sys.props("java.io.tmpdir"), s"graft_$name")
    // compaction changes no row: fragmented pile and compacted table
    // answer the incremental query identically
    val delta = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    def run(index: org.apache.spark.sql.DataFrame) =
      graft.dedup.MinHashLSH.incrementalFromIndexResult(
          index, delta, "doc_id", "text", PipelineQueries.MinhashThreshold)
        .df.orderBy("doc_a", "doc_b").collect().toSeq
    val fromFrags = run(spark.read.parquet(
      new File(dest, "fragments").getPath))
    val fromCompacted = run(spark.table(name))
    assert(fromFrags.nonEmpty && fromFrags == fromCompacted)
    // and the registered query hash-matches the full recompute
    assert(rows("q188_index_compaction", dir) == rows("q81_dedup_incremental", dir))
  }

  test("q188 plan: bucketed scan of the compacted store; delta-only source scans") {
    val df = coldPlan("q188_index_compaction")
    val idxScans = scansOf(df, "graft_dedup_cidx_")
    assert(idxScans.nonEmpty, "plan does not read the compacted store")
    idxScans.foreach { s =>
      assert(s.relation.bucketSpec.exists(_.numBuckets == 8),
        s"compacted scan lost the bucketed layout: $s")
    }
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty)
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% 10") && filters.contains("= 0"),
        s"documents scan without the delta predicate: $s")
    }
  }

  // ---- 5. forget / right-to-erasure (q191) ------------------------------

  test("q191: forgotten cohort is gone from the stored index AND from every pair") {
    val dir = tmpCorpus("documents")
    val name = PipelineQueries.ensureForgetIndex(spark, dir)
    // the index at rest carries no forgotten row — erasure of the
    // DERIVED data, not output filtering
    val leaked = spark.table(name)
      .filter(org.apache.spark.sql.functions.col("id")
        % PipelineQueries.ForgetMod === PipelineQueries.ForgetRem)
      .count()
    assert(leaked == 0, s"$leaked forgotten rows survive in the stored index")
    // and the query result equals q184's minus pairs touching the cohort
    val got = rows("q191_index_forget", dir)
    val want = rows("q184_dedup_stored_index", dir).filter { r =>
      r.getLong(0) % PipelineQueries.ForgetMod != PipelineQueries.ForgetRem &&
        r.getLong(1) % PipelineQueries.ForgetMod != PipelineQueries.ForgetRem
    }
    assert(got == want)
    assert(got.size < rows("q184_dedup_stored_index", dir).size ||
      want.size == got.size) // erasure is exact, never over-broad
  }

  // ---- 6. upsert / CDC apply (q193) --------------------------------------

  test("q193: upsert replaces exactly the cohort's rows, derived from the revised text") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dir = tmpCorpus("documents")
    val upName = PipelineQueries.ensureUpsertIndex(spark, dir)
    val base = spark.table(PipelineQueries.ensureDedupIndex(spark, dir))
    val up = spark.table(upName)
    val cohort = (df: DataFrame) =>
      df.filter(col("id") % PipelineQueries.UpsertMod === PipelineQueries.UpsertRem)
    val rest = (df: DataFrame) =>
      df.filter(col("id") % PipelineQueries.UpsertMod =!= PipelineQueries.UpsertRem)
    val byId = (df: DataFrame) => df.orderBy("id").collect().toSeq
    // non-cohort rows ride through the upsert byte-for-byte
    assert(byId(rest(up)) == byId(rest(base)))
    // cohort rows are the fresh derivation from the REVISED text —
    // and genuinely differ from the stale pre-upsert rows
    val revised = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % PipelineQueries.UpsertMod === PipelineQueries.UpsertRem &&
        col("doc_id") % 10 =!= 0)
      .withColumn("text", concat(col("text"), lit(PipelineQueries.UpsertSuffix)))
    val want = graft.dedup.MinHashLSH.indexRows(revised, "doc_id", "text")
    assert(byId(cohort(up)).nonEmpty && byId(cohort(up)) == byId(want))
    assert(byId(cohort(up)) != byId(cohort(base)),
      "upserted cohort rows identical to the stale store — the edit was lost")
  }

  test("q193 equals the full recompute over the edited corpus row-for-row") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val dir = tmpCorpus("documents")
    // materialize the edited corpus and run the scratch incremental
    // pipeline (q81) on it: the index-served q193 must match it exactly
    val dir2 = Files.createTempDirectory("graft_upsert_recompute_").toFile
    tmpCorpora += dir2.getPath
    dir2.deleteOnExit()
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % PipelineQueries.UpsertMod === PipelineQueries.UpsertRem,
          concat(col("text"), lit(PipelineQueries.UpsertSuffix)))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"${dir2.getPath}/documents.parquet")
    val stored = rows("q193_index_upsert", dir)
    val recompute = rows("q81_dedup_incremental", dir2.getPath)
    assert(stored.nonEmpty && stored == recompute)
  }

  test("q193 plan: documents scans are delta-only; upserted store read from disk") {
    val df = coldPlan("q193_index_upsert")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected delta scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% 10") && filters.contains("= 0"),
        s"documents scan without the delta predicate (base text re-read!): $s")
    }
    assert(scansOf(df, "graft_dedup_uidx_").nonEmpty,
      "plan does not read the persisted upserted index")
  }

  // ---- 7. PQ codes at rest (q202) ----------------------------------------

  test("q202 equals q102's train-encode-search recompute path row-for-row") {
    val stored = rows("q202_pq_stored_index")
    val recompute = rows("q102_pq_ann")
    assert(stored.nonEmpty && stored == recompute)
  }

  test("q202 plan: codes read from the store; no pq_encode at query time") {
    val df = coldPlan("q202_pq_stored_index")
    assert(scansOf(df, "graft_pq_idx_").nonEmpty,
      "plan does not read the persisted PQ codes")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("pq_encode"),
      "pq_encode in the serving plan — the corpus is being re-encoded at query time")
    // the counterfactual: the scratch q102 path DOES encode inline
    spark.catalog.clearCache()
    val scratch = SparkEntry.queries("q102_pq_ann")(spark, sfDir)
    assert(scratch.queryExecution.executedPlan.toString
      .toLowerCase.contains("pq_encode"),
      "q102's scratch plan no longer encodes inline — counterfactual broken")
  }

  test("q202's PQ store rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("embeddings")
    val root1 = PipelineQueries.ensurePqIndex(spark, dir)
    assert(IndexStore.hasSuccess(new File(root1, "codes")))
    val emb = new File(dir, "embeddings.parquet")
    assert(emb.setLastModified(emb.lastModified() + 5000))
    val root2 = PipelineQueries.ensurePqIndex(spark, dir)
    assert(root2 != root1, "fingerprint change did not mint a new PQ store")
    assert(!new File(root1).exists(), "superseded PQ generation not cleaned")
    assert(IndexStore.hasSuccess(new File(root2, "codes")))
  }

  // ---- 8. stored eval-fp decontamination (q203) ---------------------------

  test("q203 equals the full-scan q57 decontamination row-for-row") {
    val stored = rows("q203_decontam_stored")
    val fullScan = rows("q57_decontaminate")
    assert(stored.nonEmpty && stored == fullScan)
  }

  test("q203 plan: every documents scan is not-bench; bench fp read from the store") {
    val df = coldPlan("q203_decontam_stored")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected training-side scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% " + ScaleQueries.BenchMod),
        s"documents scan without the not-bench predicate (eval text re-read!): $s")
    }
    assert(scansOf(df, "graft_bench_fp_").nonEmpty,
      "plan does not read the persisted bench fingerprint set")
  }

  test("q203's bench-fp store rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("documents")
    val root1 = ScaleQueries.ensureBenchFpIndex(spark, dir)
    assert(IndexStore.hasSuccess(new File(root1)))
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val root2 = ScaleQueries.ensureBenchFpIndex(spark, dir)
    assert(root2 != root1, "fingerprint change did not mint a new fp store")
    assert(!new File(root1).exists(), "superseded fp generation not cleaned")
    assert(IndexStore.hasSuccess(new File(root2)))
  }

  // ---- 9. stored reference LM quality filter (q205) -----------------------

  test("q205 plan: every documents scan is not-ref; model read from the store") {
    val df = coldPlan("q205_lm_quality_stored")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected candidate-side scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% " + ScaleQueries.LmRefMod),
        s"documents scan without the not-ref predicate (reference re-tokenized!): $s")
    }
    assert(scansOf(df, "graft_lm_ref_").nonEmpty,
      "plan does not read the persisted reference model")
  }

  test("q205's reference model rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("documents")
    val root1 = ScaleQueries.ensureLmRefModel(spark, dir)
    assert(IndexStore.hasSuccess(new File(root1, "vocab")) &&
      IndexStore.hasSuccess(new File(root1, "bigrams")))
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val root2 = ScaleQueries.ensureLmRefModel(spark, dir)
    assert(root2 != root1, "fingerprint change did not mint a new model store")
    assert(!new File(root1).exists(), "superseded model generation not cleaned")
  }

  // ---- 10. composed release gate (q209) -----------------------------------

  test("q209 plan: every documents scan excludes eval AND ref; both stores read") {
    val df = coldPlan("q209_release_gate")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected candidate-side scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% " + ScaleQueries.BenchMod) &&
        filters.contains("% " + ScaleQueries.LmRefMod),
        s"documents scan missing a split predicate (store contents re-derived!): $s")
    }
    assert(scansOf(df, "graft_bench_fp_").nonEmpty,
      "plan does not read the bench fingerprint store")
    assert(scansOf(df, "graft_lm_ref_").nonEmpty,
      "plan does not read the reference n-gram store")
  }

  test("q209 verdicts conserve the candidate universe and respect precedence") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q209_release_gate")(spark, sfDir).collect()
    val total = out.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    val candidates = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % ScaleQueries.BenchMod =!= 0 &&
        col("doc_id") % ScaleQueries.LmRefMod =!= 0).count()
    assert(total == candidates, s"verdicts $total != candidates $candidates")
    // the gate is live: at least one doc dropped on each ground overall
    assert(out.map(_.getLong(2)).sum > 0, "no contamination drops — gate is dead")
    assert(out.map(_.getLong(3)).sum > 0, "no quality drops — threshold is dead")
  }

  // ---- 11. cluster maintenance on append (q212) ---------------------------

  test("q212 equals q56's full-recompute clusters row-for-row") {
    val inc = rows("q212_incremental_clusters")
    val full = rows("q56_dedup_clusters")
    assert(inc.nonEmpty && inc == full)
  }

  test("q212 edge plan: documents scans are delta-only; label store + dedup index read") {
    spark.catalog.clearCache()
    val df = ScaleQueries.incrementalClusterEdges(spark, sfDir)
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected delta scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% 10") && filters.contains("= 0"),
        s"documents scan without the delta predicate (base text re-read!): $s")
    }
    assert(scansOf(df, "graft_cluster_idx_").nonEmpty,
      "plan does not read the persisted label store")
    assert(scansOf(df, "graft_dedup_idx_").nonEmpty,
      "plan does not read the persisted dedup index")
  }

  test("q212's label store holds base-side pair nodes only, labeled by min id") {
    val labels = spark.table(ScaleQueries.ensureClusterStore(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.nonEmpty)
    assert(labels.forall { case (id, _) => id % 10 != 0 },
      "a delta doc leaked into the stored base labels")
    val byComp = labels.groupBy(_._2)
    assert(byComp.forall { case (comp, members) => members.map(_._1).min == comp },
      "a stored component label is not its member minimum")
  }

  // ---- 12. tokenizer at rest (q213) ---------------------------------------

  test("q213 plan: every documents scan is not-ref; token counts nonzero") {
    val df = coldPlan("q213_bpe_stored")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected candidate-side scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% " + ScaleQueries.LmRefMod),
        s"documents scan without the not-ref predicate (training text re-read!): $s")
    }
    val out = df.collect()
    assert(out.nonEmpty && out.forall(_.getLong(3) > 0))
  }

  test("q213's stored merges equal an independent relearn from the ref dict") {
    import org.apache.spark.sql.functions._
    val store = CurationQueries.ensureBpeStore(spark, sfDir)
    val stored = spark.read
      .parquet(new File(store, "merges").getPath)
      .select("step", "left_sym", "right_sym", "pair_count")
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // independent derivation of the same dictionary + recurrence
    val dict = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % ScaleQueries.LmRefMod === 0)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(CurationQueries.BpeVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fresh = graft.text.BpeLearner.learn(dict, CurationQueries.BpeMerges)
      .map(m => (m.step, m.left, m.right, m.count))
    assert(stored.nonEmpty && stored == fresh)
    assert(stored.map(_._1) == (1L to CurationQueries.BpeMerges.toLong))
  }

  test("q213's tokenizer model rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("documents")
    val root1 = CurationQueries.ensureBpeStore(spark, dir)
    assert(IndexStore.hasSuccess(new File(root1, "merges")))
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val root2 = CurationQueries.ensureBpeStore(spark, dir)
    assert(root2 != root1, "fingerprint change did not mint a new tokenizer model")
    assert(!root1.exists(), "superseded tokenizer generation not cleaned")
    assert(IndexStore.hasSuccess(new File(root2, "merges")))
  }

  // ---- 13. Bloom seen-set store (q214) ------------------------------------

  test("q214: no false negative — every revisit row hits; any fresh hit is a measured FP") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q214_bloom_seen")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    val (revisit, fresh) = out.partition(_._2 == "revisit")
    assert(revisit.nonEmpty && revisit.forall(_._3),
      "a revisit (known-seen) doc was missed — Bloom false negative!")
    // fresh hits can only be (a) a genuine cross-shard dup or (b) an FP;
    // neither may be a miss of a genuine dup
    val baseDigests = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0)
      .selectExpr("md5(text) AS d").collect().map(_.getString(0)).toSet
    val freshDigest = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .selectExpr("doc_id", "md5(text) AS d").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fresh.foreach { case (id, _, hit) =>
      if (baseDigests.contains(freshDigest(id)))
        assert(hit, s"fresh doc $id duplicates a base doc but was not flagged")
    }
  }

  test("q214: a planted exact dup in the frontier is guaranteed to hit") {
    val tA = "the planted duplicate text that the crawler has already seen before"
    val docs = Seq(
      (1L, tA), (2L, "a unique base document with its own words"),
      (3L, "another base document nothing like the rest"),
      (10L, tA), (20L, "a genuinely fresh document never seen by the crawler"))
    val dir = Files.createTempDirectory("graft_bloom_").toFile
    dir.deleteOnExit()
    tmpCorpora += dir.getPath
    val s = spark
    import s.implicits._
    docs.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"${dir.getPath}/documents.parquet")
    val out = SparkEntry.queries("q214_bloom_seen")(spark, dir.getPath)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out(10L), "planted dup not flagged — Bloom false negative")
    assert(!out(20L), "unique doc flagged at ~0 occupancy — hashing broken?")
  }

  test("q214 plan: one frontier-predicated documents scan; position store read") {
    val df = coldPlan("q214_bloom_seen")
    val docScans = scansOf(df, "documents.parquet")
    assert(docScans.nonEmpty, "expected frontier scans of documents.parquet")
    docScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("% 10") &&
        filters.contains("% " + PipelineQueries.BloomRevisitMod),
        s"documents scan without the frontier predicate (base text re-read!): $s")
    }
    assert(scansOf(df, "graft_bloom_seen_").nonEmpty,
      "plan does not read the persisted position table")
  }

  test("q214's seen-set rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("documents")
    val root1 = PipelineQueries.ensureBloomStore(spark, dir)
    assert(IndexStore.hasSuccess(new File(root1, "positions")))
    val doc = new File(dir, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 5000))
    val root2 = PipelineQueries.ensureBloomStore(spark, dir)
    assert(root2 != root1, "fingerprint change did not mint a new seen-set")
    assert(!root1.exists(), "superseded seen-set generation not cleaned")
    assert(IndexStore.hasSuccess(new File(root2, "positions")))
  }

  // ---- 14. index-generation diff (q217) -----------------------------------

  test("q217: changed class is exactly the upsert cohort; no text scan in the plan") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q217_index_diff")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cohort = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % PipelineQueries.UpsertMod === PipelineQueries.UpsertRem)
      .select("doc_id").collect().map(_.getLong(0))
    assert(out("changed") == (cohort.length.toLong, cohort.sum),
      s"changed class != upsert cohort: $out")
    assert(!out.contains("added") && !out.contains("removed"),
      s"upsert must replace rows, never add/remove ids: $out")
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q217_index_diff")(spark, sfDir)
    assert(scansOf(df, "documents.parquet").isEmpty,
      "the diff re-reads corpus text — it must run entirely from the stores")
    assert(scansOf(df, "graft_dedup_idx_").nonEmpty &&
      scansOf(df, "graft_dedup_uidx_").nonEmpty,
      "plan does not read both store generations")
  }

  test("q217 core: forget-store pair drives the removed and added classes") {
    val base = spark.table(PipelineQueries.ensureDedupIndex(spark, sfDir))
    val forget = spark.table(PipelineQueries.ensureForgetIndex(spark, sfDir))
    val gone = base.filter(
      org.apache.spark.sql.functions.col("id") % PipelineQueries.ForgetMod
        === PipelineQueries.ForgetRem)
      .select("id").collect().map(_.getLong(0))
    assert(gone.nonEmpty)
    val rm = PipelineQueries.indexDiffOf(base, forget).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rm("removed") == (gone.length.toLong, gone.sum) && !rm.contains("added"))
    val ad = PipelineQueries.indexDiffOf(forget, base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ad("added") == (gone.length.toLong, gone.sum) && !ad.contains("removed"))
    assert(rm("unchanged") == ad("unchanged"))
  }

  test("two concurrent builders produce one valid store (publish race)") {
    val root = Files.createTempDirectory("graft_race_").toFile
    tmpCorpora += root.getPath
    val dest = new File(root, "store")
    val started = new java.util.concurrent.CountDownLatch(2)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(tag: String): Unit =
      IndexStore.publish(dest, IndexStore.hasSuccess) { staging =>
        builds.incrementAndGet()
        started.countDown()
        started.await() // force both builders into the build phase
        assert(staging.mkdirs())
        Files.write(new File(staging, s"data_$tag.bin").toPath,
          Array[Byte](1, 2, 3))
        Files.write(new File(staging, "_SUCCESS").toPath, Array.emptyByteArray)
      }
    val t1 = new Thread(() => build("a"))
    val t2 = new Thread(() => build("b"))
    t1.start(); t2.start(); t1.join(30000); t2.join(30000)
    assert(builds.get() == 2, "both builders should have raced")
    assert(IndexStore.hasSuccess(dest), "no valid store after the race")
    // exactly one winner's data file; no staging leftovers
    val files = dest.listFiles().map(_.getName).sorted.toSeq
    assert(files.count(_.startsWith("data_")) == 1, files.toString)
    assert(!root.listFiles().exists(_.getName.contains("staging")),
      "loser's staging directory not cleaned up")
  }

  test("q185's IVF store rebuilds on source-fingerprint change") {
    val dir = tmpCorpus("embeddings")
    val base1 = PipelineQueries.ensureIvfIndex(spark, dir)
    assert(IndexStore.hasSuccess(new File(base1, "corpus")))
    val emb = new File(dir, "embeddings.parquet")
    assert(emb.setLastModified(emb.lastModified() + 5000))
    val base2 = PipelineQueries.ensureIvfIndex(spark, dir)
    assert(base2 != base1, "fingerprint change did not mint a new IVF generation")
    assert(IndexStore.hasSuccess(new File(base2, "corpus")))
    assert(!new File(base1).exists(), "superseded IVF store not deleted")
    assert(rows("q185_ann_stored_index", dir) == rows("q108_ann_incremental", dir))
  }
}
