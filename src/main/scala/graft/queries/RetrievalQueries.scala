package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{BucketedTables, IndexStore, InvertedIndex}
import QueryUtil._

/** Index-served retrieval: keyword search, exact phrase search, and
  * BM25 ranking answered from the persisted positional inverted index
  * ([[graft.sources.InvertedIndex]]) instead of a corpus scan.
  *
  * The q184/q185 stored-index contract applies verbatim: results are
  * row-for-row what the full-scan formulation produces (the oracles ARE
  * the full-scan SQL), but the plan reads the term-bucketed postings
  * store — InvertedIndexSpec pins that no query here scans
  * documents.parquet at all, and that the postings scan prunes to the
  * query terms' buckets.
  */
object RetrievalQueries {

  /** Conjunctive keyword query — three terms from the corpus vocab. */
  val KeywordQuery = Seq("stream", "window", "batch")

  /** Exact phrase query: "stream window" must appear as adjacent
    * tokens. */
  val PhraseQuery = Seq("stream", "window")

  import ScaleQueries.{MinTermLen, Bm25Query, Bm25K1, Bm25B, Bm25TopK}

  /** DuckDB rendering of the indexed token stream (the full-scan
    * oracle side): raw positions before the length filter, 1-based —
    * the exact stream [[graft.sources.InvertedIndex]] persists. */
  private def ftCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS term,
       |    generate_subscripts(string_split_regex(lower(text), '[^a-z]+'), 1) AS pos
       |  FROM documents),
       |ft AS (SELECT doc_id, term, pos FROM toks
       |       WHERE length(term) >= $MinTermLen)""".stripMargin

  // ---- q192: conjunctive keyword search from the stored index ---------

  /** Docs containing ALL query terms, with the summed term frequency —
    * answered purely from the postings store: filter `term IN (...)`
    * (bucket-pruned to ≤ 3 of 8 buckets), group by doc, keep docs
    * matching all [[KeywordQuery]] terms. The corpus text is never an
    * input. Oracle: the full-scan tokenize + group formulation. */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensureInvertedIndex(spark, dir))
      .filter(col("term").isInCollection(KeywordQuery))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("n_terms"), sum(col("tf")).as("total_tf"))
      .filter(col("n_terms") === KeywordQuery.size)
      .select(col("doc_id"), col("total_tf"))
      .orderBy("doc_id")

  val keywordSearchSql: String = {
    val terms = KeywordQuery.map(t => s"'$t'").mkString(", ")
    s"""$ftCte
       |SELECT doc_id, count(*) AS total_tf
       |FROM ft WHERE term IN ($terms)
       |GROUP BY doc_id
       |HAVING count(DISTINCT term) = ${KeywordQuery.size}
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q195: exact phrase search from the positional postings ---------

  /** Docs where the [[PhraseQuery]] tokens are ADJACENT (position b =
    * position a + 1 over the raw token sequence — dropped short tokens
    * advance the counter, so adjacency is textual). Each side is one
    * bucket-pruned posting-list read; occurrences come from a
    * positions join, never from text. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.table(ensureInvertedIndex(spark, dir))
    val a = idx.filter(col("term") === PhraseQuery(0))
      .select(col("doc_id"), explode(col("positions")).as("pa"))
    val b = idx.filter(col("term") === PhraseQuery(1))
      .select(col("doc_id").as("doc_b"), explode(col("positions")).as("pb"))
    a.join(b, col("doc_id") === col("doc_b") && col("pb") === col("pa") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min(col("pa")).as("first_pos"))
      .orderBy("doc_id")
  }

  val phraseSearchSql: String =
    s"""$ftCte
       |SELECT a.doc_id AS doc_id, count(*) AS n_occurrences,
       |  min(a.pos) AS first_pos
       |FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |WHERE a.term = '${PhraseQuery(0)}' AND b.term = '${PhraseQuery(1)}'
       |GROUP BY a.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- q194: BM25 ranking served from the stored index ----------------

  /** Okapi BM25 top-K over a postings relation: per-term df is the
    * pruned posting-list length, tf/dl ride in the rows, (N, avgdl)
    * are segment-level constants. Shared by q194 (single segment) and
    * q197 (base + appended segment, merged stats). */
  private def bm25FromPostings(postings: DataFrame, n: Double,
      avgdl: Double): DataFrame = {
    val post = postings
      .filter(col("term").isInCollection(Bm25Query))
      .select(col("term"), col("doc_id"), col("tf").cast("double").as("tf"),
        col("dl").cast("double").as("dl"))
    val df = post.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(Bm25K1) *
      (lit(1 - Bm25B) + lit(Bm25B) * col("dl") / lit(avgdl))
    post.join(broadcast(df), Seq("term"))
      .withColumn("s", idf * col("tf") * lit(Bm25K1 + 1) / norm)
      .groupBy("doc_id")
      .agg(round(sum(col("s")), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(Bm25TopK)
  }

  /** q63's Okapi BM25 top-K answered WITHOUT touching the corpus:
    * tf/dl ride in the postings, per-term df is the pruned posting-list
    * length, and (N, avgdl) come from the stats sidecar — the exact
    * doubles the full scan derives, so scores are bitwise q63's.
    * Oracle: q63's full-scan SQL verbatim. */
  def bm25StoredIndex(spark: SparkSession, dir: String): DataFrame = {
    val (name, dest) = invertedIndexLocation(dir)
    ensureInvertedIndex(spark, dir)
    val stats = spark.read.parquet(s"$dest/stats").head()
    bm25FromPostings(spark.table(name), stats.getDouble(0), stats.getDouble(1))
  }

  val bm25StoredIndexSql: String = ScaleQueries.bm25Sql

  // ---- q197: segment append — BM25 over base + appended delta ---------

  /** The APPEND quadrant for the retrieval index (q193 upserts the
    * dedup store; this appends a new segment, Lucene's only write
    * path): a crawl delta (doc_id % 10 == 0) arrives after the base
    * segment is published — its postings land as a NEW segment beside
    * the base, which is never rewritten (append-only segment files are
    * what make concurrent readers safe with zero coordination), and
    * the stats sidecars are mergeable integer partial sums
    * ([[graft.sources.InvertedIndex.segmentStatsDf]]), so the merged
    * `N` and `avgdl` are EXACT — no approximation creeps in with each
    * append. Build work ∝ delta text; the base corpus is never re-read.
    * The query unions the two segments' bucket-pruned posting reads
    * and scores with the merged stats; results are row-for-row q63's
    * full scan (the oracle) and q194's single-segment store.
    * InvertedIndexSpec pins base-segment immutability (byte-identical
    * files after the append), segment-union ≡ full rebuild, and the
    * no-corpus-scan plan. */
  def bm25AppendIndex(spark: SparkSession, dir: String): DataFrame = {
    val (name, dest) = appendIndexLocation(dir)
    ensureAppendedInvertedIndex(spark, dir)
    val merged = spark.read.parquet(s"$dest/base/stats")
      .unionByName(spark.read.parquet(s"$dest/appends/stats"))
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sdl"),
        sum(col("n_indexed")).as("ni"))
      .head()
    val n = merged.getLong(0).toDouble
    val avgdl = merged.getLong(1).toDouble / merged.getLong(2).toDouble
    val postings = spark.table(name)
      .unionByName(spark.read.parquet(s"$dest/appends/postings"))
    bm25FromPostings(postings, n, avgdl)
  }

  val bm25AppendIndexSql: String = ScaleQueries.bm25Sql

  private[graft] def appendIndexLocation(dir: String): (String, java.io.File) = {
    val dirTag = IndexStore.pathTag(dir)
    val fpTag = IndexStore.contentTag(new java.io.File(s"$dir/documents.parquet"))
    val name = s"inv_aidx_${dirTag}_$fpTag"
    val storeRoot = new java.io.File(sys.props("java.io.tmpdir"))
    (name, new java.io.File(storeRoot, s"graft_inv_aidx_${dirTag}_$fpTag"))
  }

  /** Two-segment store: `base/` (postings bucketed by term + mergeable
    * stats, built from the base corpus) then `appends/` (the delta's
    * postings + stats, a separate publish that never touches base
    * files). Each segment is its own atomic staging+rename publish, so
    * a crash between the two leaves a valid base store and the append
    * simply re-runs. Returns the catalog name of the BASE postings
    * table; the appended segment rides beside it as plain parquet
    * (small — one crawl batch — so losing bucket pruning on it costs
    * nothing; q188's compaction pattern folds it in when it grows). */
  def ensureAppendedInvertedIndex(spark: SparkSession, dir: String): String =
    RetrievalQueries.synchronized {
      val (name, dest) = appendIndexLocation(dir)
      def docs = table(spark, dir, "documents")
      def segValid(root: java.io.File): Boolean =
        IndexStore.hasSuccess(new java.io.File(root, "postings")) &&
          IndexStore.hasSuccess(new java.io.File(root, "stats"))
      if (!spark.catalog.tableExists(name)) {
        def baseDocs = docs.filter(col("doc_id") % 10 =!= 0)
        def basePostings = InvertedIndex.postingsDf(baseDocs, "doc_id", "text", MinTermLen)
        dest.mkdirs()
        IndexStore.publish(new java.io.File(dest, "base"), segValid) { staging =>
          val stagingName = s"${name}_staging"
          BucketedTables.writeBucketed(basePostings, stagingName,
            s"$staging/postings", "term", 8)
          spark.sql(s"DROP TABLE IF EXISTS $stagingName")
          InvertedIndex.segmentStatsDf(baseDocs, "doc_id", "text", MinTermLen)
            .coalesce(1).write.mode("overwrite").parquet(s"$staging/stats")
        }
        IndexStore.registerBucketed(spark, name,
          new java.io.File(dest, "base/postings").getPath,
          basePostings.schema, "term", 8)
        IndexStore.cleanupSuperseded(spark,
          new java.io.File(sys.props("java.io.tmpdir")),
          s"graft_inv_aidx_${IndexStore.pathTag(dir)}_", dest.getName,
          s"inv_aidx_${IndexStore.pathTag(dir)}_", name)
      }
      // The append runs OUTSIDE the catalog guard: a crawl delta can
      // arrive (or a torn append segment be repaired) long after the
      // base segment published — publish() is a no-op when the
      // segment is already valid, and it never opens base files.
      IndexStore.publish(new java.io.File(dest, "appends"), segValid) { staging =>
        def deltaDocs = docs.filter(col("doc_id") % 10 === 0)
        InvertedIndex.postingsDf(deltaDocs, "doc_id", "text", MinTermLen)
          .write.mode("overwrite").parquet(s"$staging/postings")
        InvertedIndex.segmentStatsDf(deltaDocs, "doc_id", "text", MinTermLen)
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/stats")
      }
      name
    }

  // ---- q204: STREAMING segment ingestion into the inverted index ------

  /** The inverted index built by STREAMING ingestion — the pipe a live
    * crawl actually feeds: documents arrive as a file stream and every
    * micro-batch publishes its postings + mergeable stats as an
    * immutable segment named by the BATCH ID. Spark's streaming
    * checkpoint is what makes ingestion exactly-once: a restarted
    * stream re-runs only batches the checkpoint has not committed, and
    * a re-run batch overwrites its OWN `seg_<batchId>` directory
    * idempotently — never another's, so a crash at any point leaves
    * either a committed batch (skipped on restart) or a torn segment
    * that its own replay rewrites. A COMPLETED checkpoint makes
    * re-invocation a no-op: the stream starts, finds no new files,
    * writes nothing (InvertedIndexSpec pins the byte-identical
    * segment snapshot across a re-run, plus the multi-batch case:
    * one file per trigger → one segment per batch, union ≡ full
    * rebuild). Serving is q197's segment union — term-filtered
    * postings from every segment, scored with stats merged from the
    * integer sidecars, so N/avgdl are exact however many batches
    * landed. Oracle: q63's full-scan SQL verbatim. */
  def streamIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    val dest = streamIndexLocation(dir)
    ensureStreamIngestedIndex(spark, dir)
    val segs = segmentDirs(dest)
    require(segs.nonEmpty, s"stream ingest produced no segments under $dest")
    val postings = segs.map(s => spark.read.parquet(s"${s.getPath}/postings"))
      .reduce(_.unionByName(_))
    val m = segs.map(s => spark.read.parquet(s"${s.getPath}/stats"))
      .reduce(_.unionByName(_))
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sdl"),
        sum(col("n_indexed")).as("ni"))
      .head()
    bm25FromPostings(postings, m.getLong(0).toDouble,
      m.getLong(1).toDouble / m.getLong(2).toDouble)
  }

  val streamIndexIngestSql: String = ScaleQueries.bm25Sql

  private[graft] def streamIndexLocation(dir: String): java.io.File = {
    val dirTag = IndexStore.pathTag(dir)
    val fpTag = IndexStore.contentTag(new java.io.File(s"$dir/documents.parquet"))
    new java.io.File(new java.io.File(sys.props("java.io.tmpdir")),
      s"graft_inv_stream_${dirTag}_$fpTag")
  }

  private[graft] def segmentDirs(dest: java.io.File): Seq[java.io.File] =
    Option(dest.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("seg_"))
      .sortBy(_.getName).toSeq

  /** Run the ingestion stream to completion (AvailableNow) against the
    * corpus file(s) matched by `glob` under `dir`. Checkpoint and
    * segments live under the content-fingerprinted store root, so a
    * data change mints a fresh root (empty checkpoint → full
    * re-ingest) and the superseded generation is cleaned. */
  private[graft] def ensureStreamIngestedIndex(spark: SparkSession, dir: String,
      glob: String = "documents.parquet", maxFilesPerTrigger: Int = 0): java.io.File =
    RetrievalQueries.synchronized {
      val dest = streamIndexLocation(dir)
      dest.mkdirs()
      // Fast path WITHIN a fingerprint generation: once a run of this
      // source version has drained (marker below), skip stream startup
      // — new data mints a new root, so staleness is impossible; a
      // crash mid-ingest leaves no marker and the checkpoint replays
      // exactly the uncommitted batches.
      val drained = new java.io.File(dest, "_INGESTED")
      if (!drained.exists()) {
        runIngestStream(spark, dir, glob, maxFilesPerTrigger, dest)
        java.nio.file.Files.write(drained.toPath, Array.emptyByteArray)
        IndexStore.cleanupSuperseded(spark,
          new java.io.File(sys.props("java.io.tmpdir")),
          s"graft_inv_stream_${IndexStore.pathTag(dir)}_", dest.getName,
          // no catalog entries for the streamed segments
          s"graft_inv_stream_${IndexStore.pathTag(dir)}_", dest.getName)
      }
      dest
    }

  /** One AvailableNow drain of the ingestion stream (the checkpointed,
    * exactly-once layer under [[ensureStreamIngestedIndex]]'s marker
    * fast path — callable directly to exercise a restart). */
  private[graft] def runIngestStream(spark: SparkSession, dir: String,
      glob: String, maxFilesPerTrigger: Int, dest: java.io.File): Unit =
      QueryUtil.withStreamStatePartitions(spark) { spark =>
        val schema = spark.read.parquet(s"$dir/documents.parquet").schema
        var reader = spark.readStream.schema(schema)
          .option("pathGlobFilter", glob)
        if (maxFilesPerTrigger > 0)
          reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
        val src = reader.parquet(dir)
        val publishSegment: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (batch, batchId) => {
            val seg = new java.io.File(dest, f"seg_$batchId%05d")
            InvertedIndex.postingsDf(batch.toDF(), "doc_id", "text", MinTermLen)
              .write.mode("overwrite").parquet(s"${seg.getPath}/postings")
            InvertedIndex.segmentStatsDf(batch.toDF(), "doc_id", "text", MinTermLen)
              .coalesce(1).write.mode("overwrite").parquet(s"${seg.getPath}/stats")
          }
        val q = src.writeStream
          .foreachBatch(publishSegment)
          .option("checkpointLocation", s"${dest.getPath}/checkpoint")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        QueryUtil.awaitOrFail(q)
      }

  // ---- q201: hybrid retrieval served entirely from stored indexes -----

  /** q150's reciprocal-rank fusion with BOTH retrievers swapped to
    * their index-at-rest serving paths: the lexical side is q194's
    * BM25 from the term-bucketed postings store, the dense side is
    * q185's search over the persisted IVF corpus (frozen quantizer,
    * cell-partitioned base, delta assigned on arrival). This is the
    * production search-stack shape — corpus text is NEVER read at
    * query time, embeddings are read only for the delta batch and the
    * query vector, and the fusion itself is the exact integer
    * `Σ 10⁶ div (k + rank)` over two k-row rank lists (q150's
    * contract, float scores never cross the fusion boundary).
    *
    * Oracle: q150's full-scan SQL VERBATIM — the stored-index serving
    * stack must reproduce the scratch pipeline bitwise, rank for
    * rank. InvertedIndexSpec pins the no-corpus-scan plan side. */
  def hybridStoredSearch(spark: SparkSession, dir: String): DataFrame = {
    import ScaleQueries.{RrfK, RrfTopK, RrfDenseQuery}
    import graft.similarity.IvfIndex
    val w = org.apache.spark.sql.expressions.Window
    val sparse = bm25StoredIndex(spark, dir) // top-RrfTopK (doc_id, bm25)
      .select(col("doc_id"), row_number()
        .over(w.orderBy(col("bm25").desc, col("doc_id")))
        .cast("long").as("bm25_rank"))
    val emb = table(spark, dir, "embeddings")
    val base = PipelineQueries.ensureIvfIndex(spark, dir)
    val centroids = spark.read.parquet(s"$base/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    val stored = spark.read.parquet(s"$base/corpus")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val delta = emb.filter(col("vec_id") % PipelineQueries.AnnDeltaMod === 0)
    val merged = stored.unionByName(
      IvfIndex.assign(delta, "vec_id", "embedding", centroids)
        .select(col("vec_id"), col("embedding"), col("cell")))
    val dense = IvfIndex.search(merged, "vec_id", "embedding",
        emb.filter(col("vec_id") === RrfDenseQuery), centroids,
        RrfTopK, nprobe = PipelineQueries.AnnNlist)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("dense_rank"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("bm25_rank", "dense_rank"))
      .withColumn("rrf_micro", expr(
        s"CASE WHEN bm25_rank > 0 THEN 1000000 div ($RrfK + bm25_rank) ELSE 0 END" +
        s" + CASE WHEN dense_rank > 0 THEN 1000000 div ($RrfK + dense_rank) ELSE 0 END"))
      .withColumn("fused_rank", row_number()
        .over(w.orderBy(col("rrf_micro").desc, col("doc_id"))).cast("long"))
      .select(col("fused_rank"), col("doc_id"), col("rrf_micro"),
        col("bm25_rank"), col("dense_rank"))
      .orderBy("fused_rank")
  }

  val hybridStoredSearchSql: String = ScaleQueries.rrfFusionSql

  // ---- store lifecycle ------------------------------------------------

  private def invertedIndexLocation(dir: String): (String, java.io.File) = {
    val dirTag = IndexStore.pathTag(dir)
    val fpTag = IndexStore.contentTag(new java.io.File(s"$dir/documents.parquet"))
    val name = s"inv_idx_${dirTag}_$fpTag"
    val storeRoot = new java.io.File(sys.props("java.io.tmpdir"))
    (name, new java.io.File(storeRoot, s"graft_inv_idx_${dirTag}_$fpTag"))
  }

  /** Write-once positional inverted index over the FULL corpus
    * (retrieval serves everything, unlike the q184 base/delta split),
    * bucketed by term. Lifecycle per [[graft.sources.IndexStore]]:
    * content-fingerprinted, staged + atomically published, superseded
    * generations cleaned. Layout: `postings/` (bucketed table) +
    * `stats/` (1-row segment metadata). Returns the catalog name. */
  def ensureInvertedIndex(spark: SparkSession, dir: String): String =
    RetrievalQueries.synchronized {
      val (name, dest) = invertedIndexLocation(dir)
      if (!spark.catalog.tableExists(name)) {
        def docs = table(spark, dir, "documents")
        def postings = InvertedIndex.postingsDf(docs, "doc_id", "text", MinTermLen)
        def valid(root: java.io.File): Boolean =
          IndexStore.hasSuccess(new java.io.File(root, "postings")) &&
            IndexStore.hasSuccess(new java.io.File(root, "stats"))
        IndexStore.publish(dest, valid) { staging =>
          val stagingName = s"${name}_staging"
          BucketedTables.writeBucketed(postings, stagingName,
            s"$staging/postings", "term", 8)
          spark.sql(s"DROP TABLE IF EXISTS $stagingName")
          InvertedIndex.statsDf(docs, "doc_id", "text", MinTermLen)
            .coalesce(1).write.mode("overwrite").parquet(s"$staging/stats")
        }
        IndexStore.registerBucketed(spark, name,
          new java.io.File(dest, "postings").getPath, postings.schema, "term", 8)
        IndexStore.cleanupSuperseded(spark,
          new java.io.File(sys.props("java.io.tmpdir")),
          s"graft_inv_idx_${IndexStore.pathTag(dir)}_", dest.getName,
          s"inv_idx_${IndexStore.pathTag(dir)}_", name)
      }
      name
    }
}
