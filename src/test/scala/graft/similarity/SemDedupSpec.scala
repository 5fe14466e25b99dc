package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.{PipelineQueries, QueryUtil}

class SemDedupSpec extends SparkSpec {

  test("verdicts implement keep-first-by-id over the pair set") {
    val s = spark
    import s.implicits._
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("doc_a", "doc_b").withColumn("cos", lit(0.99))
    val got = SemDedup.verdicts(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(1L -> ((0L, true)), 2L -> ((1L, false)),
      3L -> ((2L, false)), 4L -> ((0L, true)), 5L -> ((1L, false)),
      6L -> ((0L, true))))
  }

  test("IVF-blocked semantic dedup equals brute-force dedup on sf0.001") {
    val corpus = PipelineQueries.groupedEmbeddings(
      QueryUtil.table(spark, sfDir, "embeddings"))
    val v = corpus.select(col("vec_id"),
      CosineKnn.toDoubleArray(col("embedding")).as("e"))
    val brutePairs = v.as("a").join(v.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"),
        CosineKnn.cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= PipelineQueries.EconCos)
    val expect = SemDedup.verdicts(corpus, "vec_id", brutePairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val got = PipelineQueries.semanticDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expect)
    // and the dedup actually bites: some vectors dropped, some kept
    val kept = got.count(_._3)
    assert(kept > 0 && kept < got.size)
  }
}
