package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Earliest-arrival reachability over a TEMPORAL graph — the
  * time-respecting sibling of [[Bfs]] (hops) and [[MinPlus]] (cost):
  * each edge `(src, dst, t)` is usable only at its timestamp, and a
  * path is valid only if successive edge times are NON-DECREASING —
  * information that leaves the seed at `startT` cannot ride an edge
  * that already happened. After k rounds `arr(v)` is the earliest
  * time v can be reached using ≤ k edges:
  * `a_{k+1}(v) = min(a_k(v), min_{u→v, t ≥ a_k(u)} t)` — the
  * contamination-window question a static graph CANNOT answer (static
  * reachability over the same edges overstates spread by ignoring
  * edge ordering; the spec witnesses the gap). Pure-integer and
  * deterministic, so the oracle replays the recurrence as K unrolled
  * |V|-row SQL stages — never a path enumeration.
  *
  * Scale shape ([[MinPlus]]'s economics): edges persist once; per
  * round only the |V|-row arrival table shuffles — one join with the
  * time guard as a join predicate, one `min` re-aggregate; lazy
  * K-round plan, one final checkpoint. */
object TemporalReach {

  /** Earliest arrivals from `seed` (at time `startT`) within `rounds`
    * edges over `edges (src, dst, t)` — directed; pass both arcs for
    * an undirected graph. Returns (`node`, `arr`) for every node
    * reachable time-respectingly within `rounds`. */
  def run(edges: DataFrame, seed: Long, startT: Long,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("t").cast("long").as("t"))
      .persist()
    var a = spark.range(1).select(lit(seed).as("node"), lit(startT).as("arr"))
    // checkpoint every 2nd relaxation + (count, Σarr) convergence exit —
    // same economics and proof as MinPlus (arrivals only ever shrink,
    // nodes only ever join)
    def relax(prev: DataFrame): DataFrame =
      prev.select(col("node"), col("arr"))
        .unionByName(
          prev.join(e, col("node") === col("src") && col("t") >= col("arr"))
            .select(col("dst").as("node"), col("t").as("arr")))
        .groupBy("node").agg(min(col("arr")).as("arr"))
    def stamp(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("arr"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = stamp(a)
    var done = 0
    var converged = false
    while (done < rounds && !converged) {
      val step = math.min(2, rounds - done)
      // LAZY checkpoint; the stamp is the materializing action (one
      // job per batch — the ConnectedComponents/MinPlus convention)
      a = (1 to step).foldLeft(a)((acc, _) => relax(acc)).localCheckpoint(false)
      done += step
      val cur = stamp(a)
      converged = cur == prev
      prev = cur
    }
    e.unpersist(blocking = false)
    a
  }

  /** DuckDB mirror of one relaxation round over arrival CTE `prev`
    * and edge CTE `e0 (src, dst, t)`. */
  def relaxSql(prev: String): String =
    s"""SELECT node, min(arr)::BIGINT AS arr FROM (
       |  SELECT node, arr FROM $prev
       |  UNION ALL
       |  SELECT e0.dst AS node, e0.t AS arr
       |  FROM $prev JOIN e0 ON e0.src = $prev.node AND e0.t >= $prev.arr)
       |GROUP BY node""".stripMargin
}
