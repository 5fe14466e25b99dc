package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persisted MinHash pair store (PipelineQueries.ensurePairStore)
  * — detector economics for the q10 consumer family. Two contracts:
  *
  *  1. '''store ≡ recompute''': the verified pairs served from the
  *     store are value-identical to the from-scratch library pipeline
  *     (MinHashLSH.nearDuplicates) — same rows, same rounded floats.
  *  2. '''members read the store, not the corpus''': a consumer whose
  *     only corpus dependence IS the pair table (q10, q263, q56) must
  *     plan zero scans of documents.parquet — one detector pass per
  *     corpus generation, shared by the whole family. Consumers that
  *     also need per-doc stats (q264/q265/q270/q240/q280) still scan
  *     documents for THOSE, so the assertion there is the store scan's
  *     presence.
  */
class PairStoreSpec extends SparkSpec {

  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other =>
          other.children.flatMap(unwrap) ++
            other.subqueries.flatMap(unwrap)
      }
    unwrap(df.queryExecution.executedPlan)
  }

  private def scansOf(df: DataFrame, pathPart: String): Seq[FileSourceScanExec] =
    fileScans(df).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(pathPart)))

  private def coldPlan(q: String): DataFrame = {
    spark.catalog.clearCache()
    graft.SparkEntry.queries(q)(spark, sfDir)
  }

  test("stored verified pairs are value-identical to the recompute path") {
    val fromStore = PipelineQueries.storedVerifiedPairs(spark, sfDir)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val recomputed = graft.dedup.MinHashLSH.nearDuplicates(
        QueryUtil.table(spark, sfDir, "documents"), "doc_id", "text",
        PipelineQueries.MinhashThreshold)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(fromStore.nonEmpty, "empty pair store on the test corpus")
    assert(fromStore == recomputed)
  }

  test("store holds every banding candidate, not only verified pairs") {
    val cand = PipelineQueries.storedCandidatePairs(spark, sfDir)
    val nCand = cand.count()
    val nVerified = PipelineQueries.storedVerifiedPairs(spark, sfDir).count()
    assert(nCand > nVerified,
      "calibration needs the misses too: candidates must exceed verified")
    // candidate rows carry exact integers the members derive from
    val bad = cand.filter(col("matches") < 0 || col("matches") > 32 ||
      col("inter") < 0 || col("un") < col("inter")).count()
    assert(bad == 0)
  }

  test("pure-pair members plan zero documents scans (one detector pass)") {
    for (q <- Seq("q10_dedup_minhash", "q263_minhash_calibration",
        "q56_dedup_clusters")) {
      val df = coldPlan(q)
      assert(scansOf(df, "documents.parquet").isEmpty,
        s"$q re-derives the detector from the corpus")
      // q56's component propagation checkpoints eagerly (its returned
      // plan is decoupled from the pair scan), so the store-scan
      // presence is only assertable on the projection members
      if (q != "q56_dedup_clusters")
        assert(scansOf(df, "graft_pair_idx_").nonEmpty,
          s"$q does not read the pair store")
    }
  }

  test("stat-consuming members scan the store for pairs") {
    // q264/q265/q270 return eagerly-checkpointed results (their plans
    // are decoupled from the inputs), so the plan assertion runs on
    // the family's non-checkpointed stat consumers
    for (q <- Seq("q240_quality_auc", "q280_isotonic_calibration")) {
      val df = coldPlan(q)
      assert(scansOf(df, "graft_pair_idx_").nonEmpty,
        s"$q does not read the pair store")
      assert(scansOf(df, "documents.parquet").nonEmpty,
        s"$q still needs the corpus scan for its per-doc stats")
    }
  }
}
