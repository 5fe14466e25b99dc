package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-iterative single-source BFS — hop distances over a graph,
  * the reachability primitive behind crawl-depth audits ("how many
  * link hops from the seed list is this domain?") and graph-radius
  * sanity checks on entity graphs. Complements the other iterative
  * graph operators ([[PageRank]]: authority; [[ConnectedComponents]]:
  * equivalence classes) with shortest unweighted distance.
  *
  * Determinism: distances are exact integers — the first round that
  * reaches a node IS its hop distance, independent of partitioning or
  * join order, so the result is bit-identical in any engine (the
  * oracle replays it as a depth-bounded recursive CTE with a `min`
  * collapse — equivalent because a node's first reach is its minimum
  * depth).
  *
  * Scale shape: the EDGE table is the 100 TB-side object — persisted
  * once, never shuffled again after its first hash exchange on `src`
  * (every round's frontier⋈edges join reuses it). Per round, only the
  * frontier and the visited-set anti-join move: |frontier| narrow
  * rows out, |new frontier| rows back — never the edge count. Each
  * round's frontier persists (MEMORY_AND_DISK) because three
  * consumers read it (the next expansion, the visited anti-joins of
  * every later round, and the final union); without the persist the
  * lineage re-expands combinatorially. Rounds are bounded by
  * `maxHops` (graph diameter caps the useful depth; a fixed bound is
  * also what keeps the cross-engine oracle finite). The final
  * `localCheckpoint` materializes once and frees the scratch — the
  * [[PageRank]] convention.
  */
object Bfs {

  /** Hop distances from `seed` over `edges` (columns `src`, `dst`;
    * directed — pass both arcs for an undirected graph). Returns
    * (`node`, `dist`) for every node reachable within `maxHops`,
    * including the seed at distance 0. */
  def run(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = edges.sparkSession
    // one hash exchange on src, then never again: every round's
    // frontier⋈edges join sees the frontier as the (runtime-small)
    // side — AQE broadcasts it — while the persisted edge partitions
    // are read in place (the PageRank edge-economics)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(col("src")).persist(MEMORY_AND_DISK)
    // total node count bounds the loop from above: once the visited
    // tally reaches it, no round can add a row — this skips the
    // mostly-empty trailing rounds a generous maxHops would otherwise
    // pay (each still a full expand-distinct over the edge list)
    val seed0 = spark.range(1)
      .select(lit(seed).as("node"), lit(0L).as("dist"))
    val totalNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .union(seed0.select("node")) // seed may be edge-less
      .distinct().count()
    var levels = Vector(seed0.persist(MEMORY_AND_DISK))
    var visited = 1L
    var frontier = seed0.select("node")
    var i = 1
    while (frontier != null && i <= maxHops && visited < totalNodes) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(levels.map(_.select("node")).reduce(_.union(_)),
          Seq("node"), "left_anti")
        .select(col("node"), lit(i.toLong).as("dist"))
        .persist(MEMORY_AND_DISK)
      // count, not isEmpty: fully materializes the level (so the final
      // union reads cache instead of recomputing) and feeds the tally
      val n = next.count()
      if (n == 0) { next.unpersist(blocking = false); frontier = null }
      else { levels :+= next; visited += n; frontier = next.select("node") }
      i += 1
    }
    val result = levels.reduce(_.unionByName(_)).localCheckpoint(true)
    levels.foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    result
  }
}
