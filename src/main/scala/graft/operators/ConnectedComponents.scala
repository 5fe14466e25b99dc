package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the step that turns near-duplicate PAIRS into
  * duplicate CLUSTERS so a pipeline can keep one canonical document
  * per cluster (pairs alone under-dedup: a~b and b~c must collapse to
  * ONE kept doc, not two).
  *
  * Each iteration every node takes the min of its own label and its
  * neighbors' labels; convergence in O(graph diameter) iterations.
  * Near-dup clusters are near-cliques (diameter ~2-3), so this
  * converges in 2-4 rounds on dedup graphs — the regime this operator
  * targets. For adversarial long-chain graphs the alternating
  * large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce", SoCC'14) contracts in O(log n) rounds
  * with the same per-round join shape; the round body below is the
  * building block either way.
  *
  * Scale shape per round: one equi-join of the (2|E|) directed edge
  * list against the label table + one groupBy-min — both hash
  * shuffles on node id, broadcast nothing. The label table is
  * `localCheckpoint`ed every round: the round's plan references the
  * previous labels TWICE (join + re-select), so without a lineage cut
  * the logical plan doubles per iteration and planning itself OOMs
  * long before data does. (At production scale use a reliable
  * `checkpoint` to survive executor loss on long runs; same shape.)
  * The convergence check rides the checkpoint's materialization as an
  * aggregate, not a separate comparison join.
  */
object ConnectedComponents {

  /** Component label (the min node id reachable) for every node with
    * at least one edge. Output: (id, comp).
    *
    * @param partitions parallelism for the per-round joins — size to
    *   the EDGE LIST, not the cluster (near-dup graphs are orders of
    *   magnitude smaller than their corpus; every round pays task
    *   overhead per partition across ~4 iterations). 0 = inherit. */
  def components(
      edges: DataFrame, src: String, dst: String,
      maxIter: Int = 50, partitions: Int = 0): DataFrame = {
    val undRaw = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
    val und = (if (partitions > 0) undRaw.repartition(partitions, col("a"))
      else undRaw).persist()
    // eager localCheckpoint: materializes AND truncates lineage
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = und.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("nbr_comp"))
      val next = labels.join(nbrMin, col("id") === col("a"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).cast("int").as("__improved"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum(col("__improved")), lit(0L))).head()
        .getLong(0)
      labels = next.drop("__improved")
      iter += 1
    }
    und.unpersist()
    labels
  }
}
