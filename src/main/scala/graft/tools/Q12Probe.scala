package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.text.Hashing

/** Scratch: bisect q12's cost at sf0.1, mirroring the CURRENT
  * NgramJaccard.similarPairsResult stages. Not part of the driver
  * contract. */
object Q12Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 9
    val threshold = 0.7
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val post = graft.Partitioning.spread(docs, col("doc_id"))
      .select(col("doc_id").as("id"),
        explode(Hashing.charNgrams(col("text"), n)).as("gram"))
      .select(col("id"), Hashing.h60(col("gram")).as("g"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("postings count")(println(post.count()))
    val sizes = post.groupBy("id").agg(count(lit(1)).as("sz"))
    val df = post.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = post.join(df, "g")
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("g"))))
      .join(sizes, "id")
    val prefix = ranked.filter(
        col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("prefix count")(println(prefix.count()))
    val pa = prefix.select(col("id").as("doc_a"), col("g"), col("sz").as("sz_a"))
    val pb = prefix.select(col("id").as("doc_b"), col("g"), col("sz").as("sz_b"))
    val joined = pa.join(pb, Seq("g"))
      .filter(col("doc_a") < col("doc_b") &&
        col("sz_b") * lit(threshold) <= col("sz_a") &&
        col("sz_a") * lit(threshold) <= col("sz_b"))
    val cand = joined.select("doc_a", "doc_b").distinct()
    val candSpread = graft.Partitioning.spread(cand, col("doc_a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("cand distinct count")(println(candSpread.count()))
    // current verify: sorted hashed arrays + native two-pointer
    // intersect, join strategy left to Catalyst/AQE (no broadcast hint)
    val garr = post.groupBy("id").agg(sort_array(collect_list(col("g"))).as("gr"))
    val ga = garr.toDF("doc_a", "gr_a")
    val gb = garr.toDF("doc_b", "gr_b")
    def verify(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      candSpread.join(l, "doc_a").join(r, "doc_b")
        .withColumn("inter",
          graft.functions.ArrayOps.sortedIntersectCount(col("gr_a"), col("gr_b"))
            .cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("gr_a")) + size(col("gr_b")) - col("inter")))
        .filter(col("jaccard") >= threshold)
    val unhinted = verify(ga, gb)
    val hinted = verify(broadcast(ga), broadcast(gb))
    println("[probe] UNHINTED final plan:")
    println(unhinted.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
      .mkString("\n"))
    t("verify unhinted 1")(println(unhinted.count()))
    t("verify unhinted 2")(println(unhinted.count()))
    t("verify hinted 1")(println(hinted.count()))
    t("verify hinted 2")(println(hinted.count()))
    spark.stop()
  }
}
