package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling (Seidman '83 / Matula-Beck degeneracy
  * ordering, one level): repeatedly delete nodes of degree < k until
  * none remain — the densest-substructure filter a curation pipeline
  * uses to separate STRUCTURAL participants from incidental ones
  * (a node in the k-core has k neighbors that each have k neighbors,
  * recursively — a property no single degree threshold gives; the
  * spec's star-vs-cycle graphs witness the difference). `rounds`
  * FIXED peeling rounds keep the recurrence engine-replayable: both
  * engines compute exactly R rounds, and the spec asserts the
  * fixpoint is reached on the real graph (round R ≡ round R+1), so
  * the bounded result IS the true k-core there.
  *
  * Scale shape: per round one self-semi-join of the (shrinking) edge
  * list against the alive set and one degree re-aggregate — the
  * |V|-row economics of [[Bfs]]/[[MinPlus]]; edges only ever shrink,
  * rounds stay lazy, one final checkpoint. */
object KCore {

  /** Nodes of the k-core after `rounds` peels over undirected `edges`
    * (pass both arcs), with their in-core degree: (`node`, `deg`). */
  def run(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // spread the cached edge list (Bfs/LPA convention): a persist over
    // the small-file arcs store otherwise caches at the scan's 1-2
    // packed splits and every peel's joins run ≤2-way parallel
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).repartition(col("src")).persist()
    var alive = e.select(col("src").as("id")).distinct()
    // Checkpoint every SECOND peel: the alive set is referenced TWICE
    // per round (both endpoints), so a fully lazy loop doubles the
    // plan per round (2^R copies of the base scan by round R — this
    // froze a test run for 10+ min before the per-round fix), while
    // per-round checkpoints pay R driver-side job latencies; two lazy
    // peels per checkpoint caps the duplication at 4 subtree copies
    // and halves the job count. Early exit once the alive count stops
    // shrinking: peeling a fixpoint is the identity, so the remaining
    // rounds would recompute identical state.
    def peel(prev: DataFrame): DataFrame =
      e.join(prev.select(col("id").as("src")), Seq("src"))
        .join(prev.select(col("id").as("dst")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
    var prevN = -1L
    var done = 0
    while (done < rounds && prevN != 0L) {
      val step = math.min(2, rounds - done)
      // LAZY checkpoint; the count below materializes it (one job per
      // batch — the ConnectedComponents/MinPlus convention)
      alive = (1 to step).foldLeft(alive)((acc, _) => peel(acc))
        .localCheckpoint(false)
      done += step
      val n = alive.count() // materializes the checkpoint
      if (n == prevN) done = rounds // fixpoint
      prevN = n
    }
    val core = alive
    val result = e
      .join(core.select(col("id").as("src")), Seq("src"))
      .join(core.select(col("id").as("dst")), Seq("dst"))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    result
  }

  /** DuckDB mirror of one peeling round over alive CTE `prev` and
    * edge CTE `e0 (src, dst)`. */
  def peelSql(prev: String, k: Long): String =
    s"""SELECT e0.src AS id FROM e0
       |JOIN $prev p1 ON e0.src = p1.id
       |JOIN $prev p2 ON e0.dst = p2.id
       |GROUP BY e0.src HAVING count(*) >= $k""".stripMargin
}
