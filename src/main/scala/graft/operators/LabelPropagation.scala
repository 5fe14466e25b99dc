package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection by majority vote: every node starts as its own label and
  * each round adopts the most frequent label among its neighbors,
  * smallest label breaking ties. Where [[ConnectedComponents]] answers
  * "is there ANY path?" (one community per component), LPA finds the
  * DENSE sub-blocks inside a component — the community structure a
  * curation pipeline uses to stratify a co-purchase or citation graph
  * before sampling (one representative per community, not per
  * component).
  *
  * Determinism: the classic algorithm random-shuffles update order;
  * this is the SYNCHRONOUS variant with a total tie-break
  * (count DESC, label ASC), so round k's labels are a pure function
  * of round k-1's — bit-identical in any engine, which is what lets
  * the oracle replay it as unrolled SQL stages. Synchronous LPA can
  * oscillate on bipartite structure rather than converge; the FIXED
  * round count is therefore the operator's contract (the spec pins
  * the round-4 state, not a fixpoint claim).
  *
  * Scale shape: per round one |E|-row join against the persisted edge
  * list, one (node, label) count aggregate (map-side combined), one
  * per-node top-1 window (WindowGroupLimit pushes the rank filter
  * into the sort) — the |V|-row-state economics of [[Bfs]]/[[KCore]];
  * state checkpoints every second round (bounded lazy duplication,
  * halved job count — the MinPlus convention). */
object LabelPropagation {

  /** Labels after `rounds` synchronous updates over directed `edges`
    * (`src`, `dst`; pass both arcs for an undirected graph). A node
    * adopts the most frequent label among in-neighbors, min label on
    * ties. Returns (`node`, `label`). */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // one hash exchange on src, then never again: every round's
    // labels⋈edges join sees labels as the (small) shuffled side while
    // the persisted edge partitions are read in place (Bfs's edge
    // economics)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    def round(prev: DataFrame): DataFrame =
      e.join(prev.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        // top-1 per node WITHOUT a rank window: max of (count, -label)
        // realizes (count DESC, label ASC) as one aggregate — same
        // shuffle key as the window but no per-partition sort, and the
        // partial max combines map-side
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    var done = 0
    while (done < rounds) {
      val step = math.min(2, rounds - done)
      labels = (1 to step).foldLeft(labels)((acc, _) => round(acc))
        .localCheckpoint(true)
      done += step
    }
    e.unpersist(blocking = false)
    labels
  }

  /** DuckDB mirror of one synchronous update reading labels from CTE
    * `prev` over edge CTE `e0 (src, dst)`. */
  def roundSql(prev: String): String =
    s"""SELECT node, label FROM (
       |  SELECT e0.dst AS node, $prev.label, count(*) AS c,
       |    row_number() OVER (PARTITION BY e0.dst
       |      ORDER BY count(*) DESC, $prev.label ASC) AS rn
       |  FROM e0 JOIN $prev ON $prev.node = e0.src
       |  GROUP BY e0.dst, $prev.label)
       |WHERE rn = 1""".stripMargin
}
