package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means in exact integer micro space — the clustering
  * counterpart of q250's silhouette GRADE: q54 averages vectors within
  * GIVEN labels, q226 (DBSCAN) finds density clusters; this runs the
  * workhorse centroid iteration every embedding-curation recipe
  * (semdedup cluster pools, stratified eval splits, IVF coarse
  * quantizers — q25 trains one implicitly) reaches for first.
  *
  * Determinism discipline (the q250 conventions, end to end):
  * coordinates quantize ONCE to `floor(x·10⁶)` (one exact IEEE
  * multiply); centroids are sign-peel-truncated integer means;
  * squared distances exact int64 (|x| < 1 ⇒ ≤ 64·(2·10⁶)² ≈ 2.6·10¹¹
  * per pair); the argmin assignment breaks ties by smaller centroid
  * id. Initialization is the k smallest `vec_id`s' vectors (engine-
  * independent; k-means|| would be the scale-grade init, but its
  * weighted sampling is RNG-bearing — the deterministic seed keeps
  * the oracle bit-exact, and the ITERATION is the operator under
  * test). A centroid that wins no members simply drops out of the
  * next round (documented Lloyd edge case; k is an upper bound).
  *
  * Scale shape: the vector table explodes once to n·d (map-side
  * combined everywhere it aggregates); each assign joins that against
  * a k·d centroid table (broadcast — centroids are KB-sized) and
  * argmins per vector; each update is a (cid, dim)-keyed aggregate.
  * Nothing is O(n²), nothing collects vectors to the driver.
  */
object KMeansMicro {

  /** Final assignment after `rounds` full Lloyd rounds from the
    * k-smallest-id seed: (vec_id, cid, d2) where `d2` is the exact
    * squared micro distance to the FINAL centroid set (one extra
    * assign pass — the standard "inertia against the centroids you
    * ship" convention). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val v = emb
      .select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        floor(col("x").cast("double") * lit(1e6)).cast("long").as("xm"))
      .persist()
    val seeds = emb.select(col(idCol).as("cid"))
      .orderBy("cid").limit(k)
    var cents = v.join(broadcast(seeds), col("vec_id") === col("cid"))
      .select(col("cid"), col("i"), col("xm").as("cm"))
    for (_ <- 1 to rounds) {
      val a = assignOnce(v, cents).drop("d2")
      cents = v.join(a, Seq("vec_id"))
        .groupBy("cid", "i")
        .agg(sum("xm").as("sm"), count(lit(1)).as("nl"))
        .select(col("cid"), col("i"),
          expr("""CASE WHEN sm >= 0 THEN sm div nl
                  ELSE -((-sm) div nl) END""").as("cm"))
    }
    val out = assignOnce(v, cents).localCheckpoint(true)
    v.unpersist(blocking = false)
    out
  }

  /** One argmin pass: per vector the closest centroid (ties → smaller
    * cid) and its exact squared distance. */
  private def assignOnce(v: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d2 = v.join(broadcast(cents), Seq("i"))
      .groupBy("vec_id", "cid")
      .agg(sum((col("xm") - col("cm")) * (col("xm") - col("cm"))).as("d2"))
    d2.withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") === 1).drop("rn")
  }

  /** DuckDB mirror of [[assignOnce]] reading centroids from CTE
    * `cents` (cid, i, cm) and vectors from CTE `v` (vec_id, i, xm). */
  def assignSql(cents: String): String =
    s"""SELECT vec_id, cid, d2 FROM (
       |  SELECT vec_id, cid, d2, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM (
       |    SELECT v.vec_id, c.cid,
       |      sum((v.xm - c.cm) * (v.xm - c.cm))::BIGINT AS d2
       |    FROM v JOIN $cents c USING (i) GROUP BY 1, 2))
       |WHERE rn = 1""".stripMargin

  /** DuckDB mirror of the centroid update from assignment CTE
    * `a` (vec_id, cid): sign-peel integer means per (cid, dim). */
  def updateSql(a: String): String =
    s"""SELECT a.cid, v.i,
       |  (CASE WHEN sum(v.xm) >= 0 THEN sum(v.xm) // count(*)
       |        ELSE -((-sum(v.xm)) // count(*)) END)::BIGINT AS cm
       |FROM $a a JOIN v USING (vec_id) GROUP BY 1, 2""".stripMargin
}
