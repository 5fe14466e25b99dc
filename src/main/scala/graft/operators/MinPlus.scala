package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded Bellman-Ford (min-plus relaxation) — cheapest-path costs
  * from a seed within K hops, the weighted sibling of [[Bfs]]: where
  * BFS counts hops, this minimizes an integer edge-cost sum (partner
  * affinity, link latency, toll — any additive weight). K fixed
  * rounds give the classic invariant: after round k, `cost(v)` is the
  * cheapest path using ≤ k edges — a deterministic pure-integer
  * recurrence (`d_{k+1}(v) = min(d_k(v), min_{u→v}(d_k(u) + w))`),
  * independent of partitioning and join order, so the oracle can
  * replay it as K unrolled SQL stages (the PageRank.iterationSql
  * pattern) and gate hash-exact. A depth-bounded recursive-CTE
  * formulation would enumerate distinct (node, cost, hop) PATHS —
  * exponentially many on dense graphs; the round recurrence stays
  * |V|-row per stage in both engines.
  *
  * Scale shape: the edge table persists once (hash-partitioned by
  * `src` on first use, reused every round); per round only the
  * |V|-row cost table moves — one join against edges, one `min`
  * re-aggregate. The loop checkpoints every SECOND relaxation: the
  * cost table is referenced twice per round (carry-over union + join),
  * so a fully lazy chain duplicates each earlier round's work 2× per
  * later round (2^K copies of round 1 by round K — the q268/q282
  * lesson), while checkpointing every round pays K driver-side job
  * latencies; two lazy rounds per checkpoint caps the duplication at
  * 4 subtree copies and halves the job count. Convergence exits
  * early on a (count, Σcost) stamp — valid because a relaxation can
  * only add a node (count grows) or lower a cost (sum shrinks), so an
  * unchanged stamp proves the fixpoint; later rounds would recompute
  * identical state. */
object MinPlus {

  /** Cheapest ≤`rounds`-hop path costs from `seed` over `edges`
    * (columns `src`, `dst`, `w`; directed — pass both arcs for an
    * undirected graph; weights non-negative integers). Returns
    * (`node`, `cost`) for every node reachable within `rounds`. */
  def run(edges: DataFrame, seed: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .persist()
    var d = spark.range(1).select(lit(seed).as("node"), lit(0L).as("cost"))
    def relax(prev: DataFrame): DataFrame =
      prev.select(col("node"), col("cost"))
        .unionByName(
          prev.join(e, col("node") === col("src"))
            .select(col("dst").as("node"), (col("cost") + col("w")).as("cost")))
        .groupBy("node").agg(min(col("cost")).as("cost"))
    def stamp(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("cost"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = stamp(d)
    var done = 0
    var converged = false
    while (done < rounds && !converged) {
      val step = math.min(2, rounds - done)
      // LAZY checkpoint + stamp as the materializing action (the
      // ConnectedComponents convention): one job per batch instead of
      // checkpoint-job + stamp-job — on this loop of tiny stages the
      // job count is the cost, not the data
      d = (1 to step).foldLeft(d)((acc, _) => relax(acc)).localCheckpoint(false)
      done += step
      val cur = stamp(d) // materializes the checkpoint
      converged = cur == prev
      prev = cur
    }
    e.unpersist(blocking = false)
    d
  }

  /** DuckDB mirror of one relaxation round, reading costs from CTE
    * `prev` over edge CTE `e0 (src, dst, w)`. */
  def relaxSql(prev: String): String =
    s"""SELECT node, min(cost)::BIGINT AS cost FROM (
       |  SELECT node, cost FROM $prev
       |  UNION ALL
       |  SELECT e0.dst AS node, $prev.cost + e0.w AS cost
       |  FROM $prev JOIN e0 ON e0.src = $prev.node)
       |GROUP BY node""".stripMargin
}
