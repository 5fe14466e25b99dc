package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-quantized PageRank (Page et al. 1999) — the graph-authority
  * operator crawl-curation pipelines use to weight web domains by link
  * structure (a la CommonCrawl harmonic/PageRank domain ranks) before
  * sampling training data from them.
  *
  * Determinism: ranks live in integer MILLIONTHS of a unit (init
  * 1,000,000 per node; the non-normalized convention where ranks sum
  * ≈ N). One iteration is
  * `r'(v) = (1-d)·10⁶ + (d_pct · Σ_{u→v} (r(u) div deg⁺(u))) div 100`
  * — every step integer arithmetic (`div` truncates toward zero, as
  * does DuckDB `//`: measured `-7 // 2 = -3`, see DivSemanticsSpec —
  * here all values are non-negative anyway), so the result
  * is bit-identical in any engine and independent of partitioning /
  * summation order. The tiny mass the floor divisions shed is the
  * price of exactness; ranking behavior is unchanged.
  *
  * Scale shape: the EDGE table is the 100 TB-side object and is
  * hash-partitioned by `src` once — every iteration's
  * edges⋈ranks join reuses that exchange, so each iteration moves
  * only the per-node rank table (|V| narrow rows: one shuffle to
  * co-locate with edges, one to re-aggregate on `dst`). Rank state
  * never collects to the driver; the loop builds a 3-deep plan
  * (iteration counts here are small and fixed — deeper loops would
  * `localCheckpoint` per round like
  * [[ConnectedComponents]]).
  */
object PageRank {

  val RankUnit = 1000000L

  /** Run `iterations` rounds over `edges` (columns `src`, `dst`;
    * pre-deduplicated). Nodes = distinct `src` ∪ `dst`; a node with no
    * out-edges contributes nothing (standard dangling-mass drop), a
    * node with no in-edges settles at the `(1-d)` base. Returns
    * (`node`, `rank`). */
  def run(edges: DataFrame, iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // Shuffle economics: the EDGE table is the big side, so (a) it
    // persists once and is never joined against anything bigger than
    // |V|; (b) each iteration first collapses rank/deg to the |V|-row
    // `rank div deg` table and joins THAT into the edges (AQE turns it
    // into a broadcast at these sizes; at cluster scale it hash-joins
    // co-partitioned on src) — so per iteration only the per-node
    // tables and the one dst-keyed contribution aggregate shuffle. The
    // loop stays LAZY (plan size linear in iterations) and
    // materializes in ONE eager localCheckpoint at the end — per-round
    // eager checkpoints cost a job-scheduling round trip each; a
    // deep-iteration caller would re-introduce a periodic checkpoint
    // like [[ConnectedComponents]].
    // the hash exchange on src the scaladoc promises — without it the
    // cached edge partitioning inherits the scan's splits (the
    // 4-small-file arcs store packs into 1-2 input splits) and every
    // iteration's edges⋈ranks compute ran ≤2-way parallel
    val e = edges.repartition(col("src")).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .persist()
    val result = iterate(e, deg, nodes, iterations, dampingPct)
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    result
  }

  /** The LAZY end-to-end iteration plan, without [[run]]'s persists
    * and final materializing `localCheckpoint` — exposed so plan-shape
    * tests can count per-iteration exchanges (the "only |V|-row tables
    * shuffle per round" contract) on the plan the loop actually
    * builds. */
  def plan(edges: DataFrame, iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
    iterate(edges, deg, nodes, iterations, dampingPct)
  }

  private def iterate(e: DataFrame, deg: DataFrame, nodes: DataFrame,
      iterations: Int, dampingPct: Int): DataFrame = {
    val base = (100 - dampingPct) * RankUnit / 100
    var ranks = nodes.withColumn("rank", lit(RankUnit))
    for (_ <- 1 to iterations) {
      val rd = ranks.join(deg, col("node") === col("src"))
        .select(col("node").as("u"), expr("rank div deg").as("rd"))
      val contrib = e.join(rd, col("src") === col("u"))
        .groupBy(col("dst").as("n"))
        .agg(sum("rd").as("c"))
      ranks = nodes
        .join(contrib, col("node") === col("n"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(c, 0L)) div 100"))
            .as("rank"))
    }
    ranks
  }

  /** DuckDB mirror of one [[run]] iteration, reading ranks from CTE
    * `prev` and edge/degree/node CTEs `e` (src, dst, deg) and `n`
    * (node). */
  def iterationSql(prev: String, dampingPct: Int = 85): String = {
    val base = (100 - dampingPct) * RankUnit / 100
    s"""SELECT n.node,
       |  ($base + ($dampingPct * coalesce(c.c, 0)) // 100)::BIGINT AS rank
       |FROM n LEFT JOIN (
       |  SELECT e.dst AS node, sum($prev.rank // e.deg)::BIGINT AS c
       |  FROM e JOIN $prev ON e.src = $prev.node
       |  GROUP BY e.dst) c USING (node)""".stripMargin
  }

  /** PERSONALIZED PageRank (random walk with restart to a seed SET):
    * the teleport mass lands only on seeds — `r'(v) = 1[v∈S]·(1-d)·10⁶
    * + (d·Σ contributions) div 100` — so rank measures authority AS
    * SEEN FROM the seed slice (topic-/domain-conditional authority,
    * the recommendation and focused-crawl variant of [[run]]). Same
    * integer-millionths determinism, same per-iteration shuffle
    * economics; `seeds` is one `node` column, restricted to graph
    * nodes by the flag join. Init: 10⁶ on seeds, 0 elsewhere. */
  def runPersonalized(edges: DataFrame, seeds: DataFrame,
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = (100 - dampingPct) * RankUnit / 100
    val e = edges.repartition(col("src")).persist() // see run()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val flagged = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .join(seeds.select(col("node")).distinct().withColumn("__s", lit(1)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0)).as("is_seed"))
      .persist()
    var ranks = flagged.select(col("node"),
      (col("is_seed").cast("long") * RankUnit).as("rank"))
    for (_ <- 1 to iterations) {
      val rd = ranks.join(deg, col("node") === col("src"))
        .select(col("node").as("u"), expr("rank div deg").as("rd"))
      val contrib = e.join(rd, col("src") === col("u"))
        .groupBy(col("dst").as("n"))
        .agg(sum("rd").as("c"))
      ranks = flagged
        .join(contrib, col("node") === col("n"), "left")
        .select(col("node"),
          (col("is_seed").cast("long") * base +
            expr(s"($dampingPct * coalesce(c, 0L)) div 100")).as("rank"))
    }
    val result = ranks.localCheckpoint(true)
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    flagged.unpersist(blocking = false)
    result
  }

  /** DuckDB mirror of one [[runPersonalized]] iteration: node CTE is
    * `n2 (node, is_seed)`. */
  def personalizedIterationSql(prev: String, dampingPct: Int = 85): String = {
    val base = (100 - dampingPct) * RankUnit / 100
    s"""SELECT n2.node,
       |  (n2.is_seed * $base + ($dampingPct * coalesce(c.c, 0)) // 100)::BIGINT
       |    AS rank
       |FROM n2 LEFT JOIN (
       |  SELECT e.dst AS node, sum($prev.rank // e.deg)::BIGINT AS c
       |  FROM e JOIN $prev ON e.src = $prev.node
       |  GROUP BY e.dst) c USING (node)""".stripMargin
  }
}
