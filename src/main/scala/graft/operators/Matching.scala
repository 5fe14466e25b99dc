package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic greedy MAXIMAL MATCHING by mutual-minimum proposals —
  * the coarsening primitive under multilevel graph partitioners
  * (METIS-style contraction) and a classic O(log n)-round symmetric
  * local algorithm: every unmatched node proposes to its smallest-id
  * unmatched neighbor; a pair that proposes to EACH OTHER matches and
  * leaves the graph; repeat. No randomness — the id order is the tie
  * break, so the matching is a pure function of the edge set and
  * bit-identical in any engine.
  *
  * Termination: a round with no mutual pair can only happen when no
  * edge joins two unmatched nodes (if one exists, the smallest-id
  * unmatched pair connected by an edge... more precisely the
  * globally-minimal unmatched node's proposal chain bottoms out in a
  * mutual pair), so when `rounds` suffices the result is MAXIMAL —
  * a property the caller asserts rather than assumes (see the q291
  * spec: zero remaining edges between unmatched nodes).
  *
  * Scale shape: edges persist once; each round is two bounded
  * semi-joins (restrict arcs to unmatched endpoints), one min
  * aggregate (the proposals, |V| rows), and one self-join of the
  * proposal table on itself (mutuality — |V| rows). Per-round state
  * checkpoints eagerly: the loop's tables are |V|-row and each round
  * references the previous one several times (the q268/q282 lesson).
  */
object Matching {

  /** Run `rounds` proposal rounds over symmetric `arcs` (src, dst).
    * Returns (round, new_pairs, cum_pairs, unmatched_nodes) per round
    * 1..rounds. */
  def rounds(arcs: DataFrame, nRounds: Int): DataFrame = {
    require(nRounds >= 1)
    // plain persist: the q291 caller feeds a distinct() output, whose
    // shuffle already spread the cache; an extra repartition here is a
    // redundant exchange (A/B'd 2026-08-19). A caller scanning a
    // small-file store should spread BEFORE calling.
    val e = arcs.persist()
    var un = e.select(col("src").as("v")).distinct().localCheckpoint(true)
    val nNodes = un.count()
    var cum = 0L
    var out = Vector.empty[(Long, Long, Long, Long)]
    var converged = false
    for (r <- 1 to nRounds) {
      // once a round matches nothing the state is frozen — every later
      // round recomputes the identical zero, so fill those rows without
      // paying their jobs (the per-round job latency is what a stall-y
      // phase amplifies)
      if (converged) {
        out :+= ((r.toLong, 0L, cum, nNodes - 2 * cum))
      } else {
        val live = e
          .join(un.select(col("v").as("u1")), col("src") === col("u1"))
          .join(un.select(col("v").as("u2")), col("dst") === col("u2"))
          .select("src", "dst")
        val cand = live.groupBy(col("src").as("v"))
          .agg(min("dst").as("c"))
        val mutual = cand.as("c1")
          .join(cand.as("c2"), col("c1.c") === col("c2.v") &&
            col("c2.c") === col("c1.v") && col("c1.v") < col("c1.c"))
          .select(col("c1.v").as("a"), col("c1.c").as("b"))
        // ONE checkpoint + ONE count per round: the matched-pair count
        // falls out of the unmatched-set shrinkage (each mutual pair
        // removes exactly 2 nodes), so the separate mutual.count() +
        // second checkpoint the first cut paid — 2 extra job
        // dispatches per round, the dominant cost of this loop under
        // a stall-y phase — carry no information and are gone.
        val prevUn = nNodes - 2 * cum
        // LAZY checkpoint; the count below is the materializing action
        // (one job per round — the ConnectedComponents convention)
        un = un.join(
            mutual.select(explode(array(col("a"), col("b"))).as("v")),
            Seq("v"), "left_anti")
          .localCheckpoint(false)
        val matched = (prevUn - un.count()) / 2
        converged = matched == 0
        cum += matched
        out :+= ((r.toLong, matched, cum, nNodes - 2 * cum))
      }
    }
    val spark = arcs.sparkSession
    e.unpersist(blocking = false)
    spark.createDataFrame(out)
      .toDF("round", "new_pairs", "cum_pairs", "unmatched_nodes")
  }

  /** Remaining edges joining two unmatched nodes after [[rounds]] —
    * zero iff the matching is maximal (the spec's gate). */
  def remainingEdges(arcs: DataFrame, nRounds: Int): Long = {
    val e = arcs.persist()
    var un = e.select(col("src").as("v")).distinct()
    var converged = false
    for (_ <- 1 to nRounds if !converged) {
      val live = e
        .join(un.select(col("v").as("u1")), col("src") === col("u1"))
        .join(un.select(col("v").as("u2")), col("dst") === col("u2"))
        .select("src", "dst")
      val cand = live.groupBy(col("src").as("v")).agg(min("dst").as("c"))
      val mutual = cand.as("c1")
        .join(cand.as("c2"), col("c1.c") === col("c2.v") &&
          col("c2.c") === col("c1.v") && col("c1.v") < col("c1.c"))
        .select(col("c1.v").as("a"), col("c1.c").as("b"))
        .localCheckpoint(true)
      // frozen state: every later round recomputes the identical
      // zero — stop paying its per-round jobs (same short-circuit as
      // rounds(); the checkpoint makes the count a local scan)
      converged = mutual.isEmpty
      un = un.join(
          mutual.select(explode(array(col("a"), col("b"))).as("v")),
          Seq("v"), "left_anti")
        .localCheckpoint(true)
    }
    val n = e
      .join(un.select(col("v").as("u1")), col("src") === col("u1"))
      .join(un.select(col("v").as("u2")), col("dst") === col("u2"))
      .count()
    e.unpersist(blocking = false)
    n
  }

  /** One oracle round: from unmatched CTE `$un` and matched-pair CTE
    * `$m`, derive `cand_$k`, `new_$k`, `m_$next`, `un_$next` (arcs CTE
    * is `arcs`). Every per-round CTE is MATERIALIZED — each is
    * referenced several times by the next round, and a lazy CTE chain
    * re-expands multiplicatively per round (the q288 lesson; here the
    * 12-round chain exhausted file descriptors re-opening the source
    * parquet before it exhausted patience). */
  def roundSql(k: Int, un: String, m: String): String = {
    s"""cand_$k AS MATERIALIZED (
       |  SELECT a.src AS v, min(a.dst) AS c
       |  FROM arcs a
       |  JOIN $un u1 ON u1.v = a.src
       |  JOIN $un u2 ON u2.v = a.dst
       |  GROUP BY a.src),
       |new_$k AS MATERIALIZED (
       |  SELECT c1.v AS a, c1.c AS b
       |  FROM cand_$k c1 JOIN cand_$k c2 ON c2.v = c1.c
       |  WHERE c2.c = c1.v AND c1.v < c1.c),
       |m_${k + 1} AS MATERIALIZED (
       |  SELECT a, b FROM $m UNION ALL SELECT a, b FROM new_$k),
       |un_${k + 1} AS MATERIALIZED (
       |  SELECT v FROM $un
       |  WHERE v NOT IN (SELECT a FROM new_$k)
       |    AND v NOT IN (SELECT b FROM new_$k))""".stripMargin
  }
}
