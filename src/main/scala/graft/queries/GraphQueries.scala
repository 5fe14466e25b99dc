package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PageRank
import QueryUtil._

/** Graph-analytics surface: link-authority ranking
  * ([[graft.operators.PageRank]]) over a graph derived from the
  * relational tables — the domain-authority weighting step of a
  * crawl-curation pipeline, demonstrated on the procurement graph.
  */
object GraphQueries {

  val PrIterations = 3
  val PrTopK = 20

  /** Integer-quantized PageRank over the customer↔supplier purchase
    * graph: an (undirected, so both directed arcs) edge wherever a
    * customer ordered a line item from a supplier, nodes tagged
    * `C<custkey>` / `S<suppkey>`. Three damped iterations in exact
    * integer millionths ([[graft.operators.PageRank]]), then the
    * top-[[PrTopK]] authorities — high-degree suppliers surface
    * exactly like high-inlink web domains would.
    *
    * Scale shape: edge construction is one orders⋈lineitem join on the
    * order key (both sides huge → shuffle join on `l_orderkey`) +
    * a distinct collapse (map-side combined); the per-iteration cost
    * is documented on the operator. Final top-K is
    * TakeOrderedAndProject, never a global sort. */
  def purchasePagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = table(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(table(spark, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("C"), col("o_custkey")).as("c"),
        concat(lit("S"), col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    PageRank.run(edges, PrIterations)
      .orderBy(col("rank").desc, col("node"))
      .limit(PrTopK)
  }

  val purchasePagerankSql: String = {
    val it = (p: String) => PageRank.iterationSql(p)
    s"""WITH p AS (
       |  SELECT DISTINCT 'C' || o_custkey::VARCHAR AS c,
       |    'S' || l_suppkey::VARCHAR AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e0 AS (
       |  SELECT c AS src, s AS dst FROM p
       |  UNION ALL SELECT s, c FROM p),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e0 GROUP BY src),
       |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
       |n AS (SELECT DISTINCT src AS node FROM e0),
       |r0 AS (SELECT node, ${PageRank.RankUnit}::BIGINT AS rank FROM n),
       |r1 AS (${it("r0")}),
       |r2 AS (${it("r1")}),
       |r3 AS (${it("r2")})
       |SELECT node, rank FROM r3
       |ORDER BY rank DESC, node LIMIT $PrTopK""".stripMargin
  }
}
