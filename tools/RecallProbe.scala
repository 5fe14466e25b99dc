package tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{CosineKnn, IvfIndex}

/** Scratch harness: candidate recall of IvfIndex.nearDupCandidates vs
  * the exact all-pairs near-dup set, per SF and nprobe. Not shipped. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("recall-probe").getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      emb.count()
      val exact = CosineKnn.nearDuplicatePairs(emb, "vec_id", "embedding", 0.4)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val centroids = IvfIndex.train(emb, "vec_id", "embedding", nlist = 16)
      for (nprobe <- Seq(4, 6, 8, 10)) {
        val cands = IvfIndex.nearDupCandidates(emb, "vec_id", "embedding", centroids, nprobe)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hit = exact.count(cands.contains)
        val n = emb.count()
        val allPairs = n * (n - 1) / 2
        println(f"$sf nprobe=$nprobe%2d exact=${exact.size} recall=${hit.toDouble / math.max(1, exact.size)}%.4f cands=${cands.size} candFrac=${cands.size.toDouble / allPairs}%.3f")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
