package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{SparkEntry, SparkSpec}
import graft.queries.{PipelineQueries, RetrievalQueries}

/** The properties that make q210 an ONLINE screen-and-ingest operator
  * rather than a re-labeled batch recompute — none visible to the
  * DuckDB oracle, whose SQL is q81's delta-restriction either way:
  *
  *  1. row-for-row equality with the q81 recompute path;
  *  2. batching INVARIANCE: one file per trigger over a sharded
  *     corpus yields one segment per batch, the segment-pair union
  *     equals the recompute, no pair is emitted twice, and a pair
  *     whose two delta sides arrive in DIFFERENT batches is still
  *     found (the later batch screens against the earlier's ingested
  *     segment — the property that distinguishes screen-AND-ingest
  *     from screen-only);
  *  3. exactly-once at both layers (q204's convention): the
  *     `_SCREENED` marker short-circuits stream startup, and without
  *     the marker the CHECKPOINT makes a re-drain write nothing;
  *  4. serving reads segments only: the q210 result plan scans the
  *     stream store, never documents.parquet — all screening work
  *     happened at ingest time.
  */
class StreamScreenSpec extends SparkSpec
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

  test("q210 equals q81's recompute path row-for-row") {
    val screened = SparkEntry.queries("q210_stream_dedup_screen")(spark, sfDir)
      .collect().toSeq
    val recompute = SparkEntry.queries("q81_dedup_incremental")(spark, sfDir)
      .collect().toSeq
    assert(screened.nonEmpty && screened == recompute)
  }

  test("q210 serving plan reads the stream store only — never documents") {
    PipelineQueries.ensureScreenedStream(spark, sfDir) // drained (marker set)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q210_stream_dedup_screen")(spark, sfDir)
    assert(scansOf(df, "documents.parquet").isEmpty,
      "q210 serving re-reads corpus text — screening must happen at ingest")
    assert(scansOf(df, "graft_dedup_stream_").nonEmpty,
      "q210 serving does not read the stream store's segments")
  }

  /** Synthetic corpus with KNOWN near-dup structure, sharded so that
    * one duplicate pair spans two different micro-batches:
    * shard 0 = base 1,2,3 + delta 10 (10 ≡ base 3's text),
    * shard 1 = base 4,5 + delta 20,
    * shard 2 = base 6,7 + delta 30 (30 ≡ delta 20's text).
    * (3,10) must come from batch 0's screen against the stored base
    * index; (20,30) can ONLY come from batch 2 screening against the
    * segment batch 1 ingested. */
  private def shardedCorpus(): (String, Seq[(Long, String)]) = {
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "colorless green ideas sleep furiously while the machine hums along quietly"
    def uniq(i: Long) =
      s"document number $i carries its own entirely distinct words alpha$i beta$i gamma$i delta$i"
    val docs: Seq[(Long, String, Int)] = Seq( // (doc_id, text, shard)
      (1L, uniq(1), 0), (2L, uniq(2), 0), (3L, tA, 0), (10L, tA, 0),
      (4L, uniq(4), 1), (5L, uniq(5), 1), (20L, tB, 1),
      (6L, uniq(6), 2), (7L, uniq(7), 2), (30L, tB, 2))
    val dir = Files.createTempDirectory("graft_streamscreen_").toFile
    dir.deleteOnExit()
    tmpCorpora += dir.getPath
    import spark.implicits._
    def write(rows: Seq[(Long, String, Int)], dest: String): Unit =
      rows.map { case (id, t, _) => (id, t, "en", "synthetic", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(dest)
    write(docs, s"${dir.getPath}/documents.parquet")
    (0 to 2).foreach { sh =>
      val staged = new File(dir, s"stage_$sh")
      write(docs.filter(_._3 == sh), staged.getPath)
      val part = Option(staged.listFiles()).toSeq.flatten
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(dir.getPath, s"docpart_$sh.parquet"))
    }
    (dir.getPath, docs.map(d => (d._1, d._2)))
  }

  test("q210 multi-batch: invariance, no double-emission, cross-batch pair found") {
    val (dir, _) = shardedCorpus()
    val dest = PipelineQueries.ensureScreenedStream(spark, dir,
      glob = "docpart_*.parquet", maxFilesPerTrigger = 1)
    val segs = RetrievalQueries.segmentDirs(dest)
    assert(segs.size == 3, s"expected 3 segments for 3 files, got ${segs.size}")
    val perSeg = segs.map(s =>
      spark.read.parquet(s"${s.getPath}/pairs")
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val union = perSeg.flatten
    assert(union.size == union.distinct.size,
      s"a pair was emitted by more than one segment: $perSeg")
    // the cross-batch delta pair (20,30) exists and was found by the
    // LAST batch — the only one that could see both sides
    assert(union.contains((20L, 30L)), s"cross-batch pair missing: $union")
    assert(perSeg.last.contains((20L, 30L)),
      s"(20,30) not found by the final batch's screen: $perSeg")
    assert(union.contains((3L, 10L)), s"base pair missing: $union")
    // full invariance: union ≡ the single-shot recompute on the corpus
    val recompute = PipelineQueries.dedupIncremental(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(union.sorted == recompute.sorted)
  }

  // ---- q219: streaming vector ingestion into the ANN store ------------

  test("q219 equals q108's one-shot assignment path row-for-row") {
    val streamed = SparkEntry.queries("q219_stream_ann_ingest")(spark, sfDir)
      .collect().toSeq
    val oneShot = SparkEntry.queries("q108_ann_incremental")(spark, sfDir)
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("q219 serving plan: embeddings read for query vectors only; store + segments read") {
    PipelineQueries.ensureAnnIngestStream(spark, sfDir)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q219_stream_ann_ingest")(spark, sfDir)
    val embScans = scansOf(df, "embeddings.parquet")
    assert(embScans.nonEmpty, "expected a query-vector scan of embeddings.parquet")
    embScans.foreach { s =>
      val filters = s.dataFilters.mkString(";")
      assert(filters.contains("< " + PipelineQueries.KnnQueries),
        s"embeddings scan without the query predicate (base/delta re-read!): $s")
    }
    assert(scansOf(df, "graft_ivf_idx_").nonEmpty,
      "plan does not read the persisted IVF corpus")
    assert(scansOf(df, "graft_ann_stream_").nonEmpty,
      "plan does not read the streamed segments")
  }

  test("q219 multi-batch: one file per trigger; segment union equals one-shot assignment") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_annstream_").toFile
    dir.deleteOnExit()
    tmpCorpora += dir.getPath
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"),
      Paths.get(dir.getPath, "embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val staging = new File(dir, "staging")
    emb.repartition(3).write.parquet(staging.getPath)
    val parts = Option(staging.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.size == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p.toPath, Paths.get(dir.getPath, s"vecpart_$i.parquet"))
    }
    val dest = PipelineQueries.ensureAnnIngestStream(spark, dir.getPath,
      glob = "vecpart_*.parquet", maxFilesPerTrigger = 1)
    val segs = RetrievalQueries.segmentDirs(dest)
    assert(segs.size == 3, s"expected 3 segments for 3 files, got ${segs.size}")
    val union = segs.map(s => spark.read.parquet(s"${s.getPath}/vectors"))
      .reduce(_.unionByName(_))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val base = PipelineQueries.ensureIvfIndex(spark, dir.getPath)
    val centroids = spark.read.parquet(s"$base/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    val oneShot = graft.similarity.IvfIndex.assign(
        emb.filter(col("vec_id") % PipelineQueries.AnnDeltaMod === 0),
        "vec_id", "embedding", centroids)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(union.nonEmpty && union == oneShot)
  }

  // ---- q221: segment promotion into a new ANN base generation ---------

  test("q221 equals q219 (hence q108) row-for-row — promotion is invisible") {
    val promoted = SparkEntry.queries("q221_ann_promotion")(spark, sfDir)
      .collect().toSeq
    val streamed = SparkEntry.queries("q219_stream_ann_ingest")(spark, sfDir)
      .collect().toSeq
    assert(promoted.nonEmpty && promoted == streamed)
  }

  test("q221 serving plan: promoted store only — no segments, no old base") {
    PipelineQueries.ensureAnnPromoted(spark, sfDir)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q221_ann_promotion")(spark, sfDir)
    assert(scansOf(df, "graft_ann_promoted_").nonEmpty,
      "plan does not read the promoted corpus")
    assert(scansOf(df, "graft_ann_stream_").isEmpty,
      "promotion left segment scans in the serving plan")
    assert(scansOf(df, "graft_ivf_idx_").isEmpty,
      "promotion left old-base corpus scans in the serving plan")
    val embScans = scansOf(df, "embeddings.parquet")
    assert(embScans.nonEmpty)
    embScans.foreach { s =>
      assert(s.dataFilters.mkString(";").contains("< " + PipelineQueries.KnnQueries),
        s"embeddings scan without the query predicate: $s")
    }
  }

  test("q221 promoted corpus is cell-partitioned and covers base + segments") {
    val root = new File(PipelineQueries.ensureAnnPromoted(spark, sfDir))
    val cellDirs = Option(new File(root, "corpus").listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "promoted corpus is not partitioned by cell")
    val promoted = spark.read.parquet(s"${root.getPath}/corpus")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(promoted == all,
      "promoted corpus does not hold exactly base + streamed vectors")
  }

  // ---- q232: streaming CDC upsert overlay on the stored index ---------

  test("q232 equals q193's at-rest upsert row-for-row — arrival mode invisible") {
    val streamed = SparkEntry.queries("q232_stream_upsert")(spark, sfDir)
      .collect().toSeq
    val atRest = SparkEntry.queries("q193_index_upsert")(spark, sfDir)
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == atRest)
  }

  test("q232 overlay covers exactly the edited cohort; base rows untouched") {
    import org.apache.spark.sql.functions.col
    val dest = PipelineQueries.ensureUpsertStream(spark, sfDir)
    val segs = RetrievalQueries.segmentDirs(dest)
    assert(segs.nonEmpty)
    val over = segs.map(s => spark.read.parquet(s"${s.getPath}/rows"))
      .reduce(_.unionByName(_))
    val overIds = over.select("id").collect().map(_.getLong(0)).toSet
    val cohort = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % PipelineQueries.UpsertMod ===
        PipelineQueries.UpsertRem && col("doc_id") % 10 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(overIds == cohort)
    // overlay rows differ from the base store's rows for those ids
    // (the revision really changed the signatures) while the effective
    // index q232 serves equals q193's upserted store row set
    val base = spark.table(PipelineQueries.ensureDedupIndex(spark, sfDir))
    val baseCohort = base.filter(col("id").isin(cohort.toSeq: _*))
      .collect().map(_.toSeq).toSet
    val overRows = over.drop("seg_batch").collect().map(_.toSeq).toSet
    assert(baseCohort.nonEmpty && overRows.nonEmpty &&
      baseCohort != overRows)
    val upserted = spark.table(PipelineQueries.ensureUpsertIndex(spark, sfDir))
      .collect().map(_.toSeq).toSet
    val eff = base.join(over.select(col("id")), Seq("id"), "left_anti")
      .unionByName(over.drop("seg_batch"))
      .collect().map(_.toSeq).toSet
    assert(eff == upserted)
  }

  test("q210 re-invocation is a no-op at BOTH layers: marker and checkpoint") {
    val dest = PipelineQueries.ensureScreenedStream(spark, sfDir)
    def snapshot(): Seq[(String, Long, Long)] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      RetrievalQueries.segmentDirs(dest)
        .flatMap(walk).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length, f.lastModified)).sortBy(_._1)
    }
    val before = snapshot()
    assert(before.nonEmpty)
    PipelineQueries.ensureScreenedStream(spark, sfDir)
    assert(snapshot() == before, "marker fast path rewrote segment files")
    assert(new File(dest, "_SCREENED").delete())
    PipelineQueries.runScreenStream(spark, sfDir, "documents.parquet", 0, dest)
    assert(snapshot() == before,
      "checkpointed re-drain rewrote committed segments — not exactly-once")
    java.nio.file.Files.write(new File(dest, "_SCREENED").toPath,
      Array.emptyByteArray)
  }
}
