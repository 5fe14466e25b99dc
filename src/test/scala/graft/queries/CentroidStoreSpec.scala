package graft.queries

import graft.SparkSpec
import graft.similarity.IvfIndex
import org.apache.spark.sql.functions._

/** The persisted IVF centroid store (PipelineQueries.storedCentroids)
  * — training economics for the embedding-query family (q24/q25/q40/
  * q86/q108/q185/q226/q315-filtered all consume centroids over the
  * same corpus derivations). Contracts:
  *
  *  1. '''store ≡ recompute, bit-exactly''': IVF training is
  *     deterministic (id-ordered / hash-spread seeds, no RNG) and
  *     doubles roundtrip parquet exactly, so the centroids served
  *     from the store must equal a from-scratch `IvfIndex.train` to
  *     the last bit — any drift would silently move cell boundaries
  *     and with them every consumer's candidate sets.
  *  2. '''variants are isolated''': different (variant, nlist, init)
  *     keys resolve to different stores — the grouped/spread-init
  *     training must never serve the full-corpus id-init consumers.
  */
class CentroidStoreSpec extends SparkSpec {

  test("stored centroids equal a from-scratch training bit-exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val direct = IvfIndex.train(emb, "vec_id", "embedding",
      nlist = PipelineQueries.NearDupNlist)
    val stored = PipelineQueries.storedCentroids(spark, sfDir, "full",
      PipelineQueries.NearDupNlist)
    assert(stored.length == direct.length)
    stored.zip(direct).zipWithIndex.foreach { case ((s, d), i) =>
      assert(s.sameElements(d), s"cell $i drifted through the store")
    }
    // memo path: a second call serves the identical array
    val again = PipelineQueries.storedCentroids(spark, sfDir, "full",
      PipelineQueries.NearDupNlist)
    assert(again.zip(stored).forall { case (a, b) => a.sameElements(b) })
  }

  test("variant keys isolate trainings") {
    val full = PipelineQueries.storedCentroids(spark, sfDir, "full",
      PipelineQueries.EconNlist)
    val grouped = PipelineQueries.storedCentroids(spark, sfDir, "grouped",
      PipelineQueries.EconNlist, spreadInit = true)
    assert(full.length == grouped.length)
    // the derived grouped corpus + spread init must actually train
    // DIFFERENT centroids — identical output would mean key collision
    assert(!full.zip(grouped).forall { case (a, b) => a.sameElements(b) })
    val g2 = graft.queries.PipelineQueries.groupedEmbeddings(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    val directGrouped = IvfIndex.train(g2, "vec_id", "embedding",
      nlist = PipelineQueries.EconNlist, spreadInit = true)
    grouped.zip(directGrouped).zipWithIndex.foreach { case ((s, d), i) =>
      assert(s.sameElements(d), s"grouped cell $i drifted")
    }
  }

  test("unknown variant is rejected loudly") {
    intercept[IllegalArgumentException] {
      PipelineQueries.storedCentroids(spark, sfDir, "nope", 4)
    }
  }
}
