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

  /** Node cap for the partition-local union-find pre-pass in
    * [[componentsStar]]: ~1M Long→Long entries ≈ tens of MB of task
    * heap, far under any sane executor budget, and enough to fully
    * contract every reasonably-split edge partition (128 MB of parquet
    * edges holds ≪ 1M distinct nodes per partition unless the split is
    * pathological — which is exactly when the cap must kick in). */
  val LocalUnionFindMaxNodes: Int = 1 << 20

  /** One partition's union-find contraction (the pre-pass body of
    * [[componentsStar]]): replaces the partition's edges with a
    * connectivity-equivalent star set (node → min-id local root),
    * holding at most `cap` nodes in memory. Once the map is full,
    * edges touching any NEW node stream through verbatim — lazily,
    * never buffered — while edges between already-tracked nodes still
    * contract; partial contraction is still connectivity-equivalent,
    * so correctness never depends on the cap. */
  private[operators] def contractPartition(
      it: Iterator[(Long, Long)], cap: Int): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // lazy filter: true = pass the edge through unchanged
    val passThrough = it.filter { case (a, b) =>
      val newNodes = (if (parent.contains(a)) 0 else 1) +
        (if (parent.contains(b)) 0 else 1)
      if (parent.size + newNodes > cap) true
      else {
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        false
      }
    }
    // ++'s right side is by-name: the star emission only builds after
    // the input (and with it the union-find) is exhausted
    passThrough ++ parent.keysIterator.toArray.iterator
      .map(n => (n, find(n))).filter { case (n, r) => n != r }
  }

  /** Component label (the min node id reachable) for every node with
    * at least one edge, by MIN-LABEL PROPAGATION — O(diameter) rounds;
    * the right default for near-dup graphs (near-cliques, diameter
    * 2-3). For unbounded-diameter graphs use [[componentsStar]]
    * (O(log n)-round alternating star contraction). Output: (id, comp).
    *
    * @param partitions parallelism for the per-round joins — size to
    *   the EDGE LIST, not the cluster (near-dup graphs are orders of
    *   magnitude smaller than their corpus; every round pays task
    *   overhead per partition across ~4 iterations). 0 = inherit. */
  def components(
      edges: DataFrame, src: String, dst: String,
      maxIter: Int = 50, partitions: Int = 0): DataFrame = {
    // single-scan direction expansion (explode, not a union of two
    // selects): a union plans the edge subtree twice, and when `edges`
    // arrives as a deep unmaterialized pipeline (q212's delta screen,
    // q226's candidates→verify) the checkpoint job below would compute
    // it twice. One scan → each upstream partition computes once.
    val undRaw = edges
      .select(explode(array(
        struct(col(src).as("a"), col(dst).as("b")),
        struct(col(dst).as("a"), col(src).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    // eager localCheckpoint, not persist: the loop re-plans a tree
    // containing the edge list once per batch, and a persisted table
    // only swaps in its cache AFTER analysis — when `edges` arrives
    // with a deep upstream plan (q212: the whole delta screen), the
    // per-batch analyzer walk of that dead subtree dominated the loop
    // (measured: 3.9 s for a 430-edge graph, jobs summing to ~1.5 s).
    // The checkpoint truncates the logical plan to a LogicalRDD, so
    // every batch plans against an edge-sized leaf.
    val und = (if (partitions > 0) undRaw.repartition(partitions, col("a"))
      else undRaw).localCheckpoint(true)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    // One propagation step; __improved counts strict improvements so
    // the batch's LAST step doubles as the convergence test.
    def step(ls: DataFrame): DataFrame = {
      val nbrMin = und.join(ls, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("nbr_comp"))
      ls.join(nbrMin, col("id") === col("a"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).cast("int").as("__improved"))
    }
    var changed = 1L
    var iter = 0
    val debug = sys.props.contains("graft.cc.debug")
    while (changed > 0 && iter < maxIter) {
      // TWO lazy steps per checkpoint (the MinPlus/KCore batching,
      // commit 56df0aa): the label table is referenced twice per step
      // (join + carry-over), so fully lazy would double the plan per
      // step — two steps caps the duplication at 4 subtree copies and
      // halves the job count of this tiny-stage loop, where wall-clock
      // is job count × dispatch overhead, not data volume. The LAZY
      // localCheckpoint keeps the convergence aggregate below as the
      // materializing action — one job per batch. Convergence reads
      // the last step's __improved only: propagation is monotone, so a
      // step that improves nothing is the fixpoint even if the step
      // before it improved.
      val t0 = System.nanoTime()
      val n = math.min(2, maxIter - iter)
      val next = (1 to n).foldLeft(labels)((acc, _) => step(acc.drop("__improved")))
        .localCheckpoint(false)
      changed = next.agg(coalesce(sum(col("__improved")), lit(0L))).head()
        .getLong(0)
      labels = next.drop("__improved")
      iter += n
      if (debug)
        System.err.println(f"[cc-ml] iters ${iter - n}->$iter changed=$changed " +
          f"took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    labels
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14:
    * the two-phase large-star/small-star algorithm) — O(log n) rounds
    * in practice (O(log² n) proven) regardless of graph DIAMETER,
    * where [[components]]' min-label propagation needs O(diameter)
    * rounds and would crawl on a 10⁶-hop chain.
    *
    * Each phase is one groupBy-min + one equi-join on node id over the
    * current edge list — the same per-round shuffle shape as
    * [[components]], so the 100 TB notes there carry over. Edges only
    * ever point big→small; a phase's output is `localCheckpoint`ed
    * (lineage cut) and the edge list provably never exceeds O(n + m).
    * Convergence = the small-star phase returns its own input (stars
    * are fixpoints of both phases), checked with two anti-joins on the
    * (shrinking) edge list.
    *
    * Output: (id, comp) for every node appearing in an edge, comp =
    * min id of the component — identical contract to [[components]]
    * (equality on random graphs is spec-asserted). */
  def componentsStar(
      edges: DataFrame, src: String, dst: String,
      maxIter: Int = 50, partitions: Int = 0): DataFrame =
    componentsStarWithRounds(edges, src, dst, maxIter, partitions)._1

  /** [[componentsStar]] plus the number of alternating rounds run —
    * exposed so the O(log n) convergence claim is testable. */
  def componentsStarWithRounds(
      edges: DataFrame, src: String, dst: String,
      maxIter: Int = 50, partitions: Int = 0): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val raw = edges.select(col(src).cast("long").as("x"), col(dst).cast("long").as("y"))
    // nodes remembered up front: singleton roots (and self-loop-only
    // nodes) drop out of the edge list but must stay in the output
    val nodes = raw.select(col("x").as("id"))
      .union(raw.select(col("y").as("id"))).distinct()
      .localCheckpoint(true)
    def rep(df: DataFrame): DataFrame =
      if (partitions > 0) df.repartition(partitions, col("x")) else df

    // one phase: emit (v, m) edges per the star rule, big→small
    // large-star: all of Γ(u), keep v > u; small-star: Γ≤(u) ∪ {u}.
    // LAZY — the caller checkpoints once per ROUND (two phases).
    //
    // Shape: m(u) = min(Γ(u) ∪ u) comes from a whole-partition window
    // MIN over the u-keyed directed list — ONE shuffle per phase,
    // replacing the groupBy + join-back formulation (two shuffles plus
    // a broadcast build per phase). The loop runs O(log n) rounds of
    // KB-to-MB-scale stages, so wall-clock here is STAGE COUNT × fixed
    // task overhead, not data volume; at 10⁸ edges both formulations
    // shuffle Γ(u) by u — the window trades nothing away at scale.
    // The large phase's output skips `distinct` entirely: duplicate
    // edges can't perturb a MIN, and the small phase's own distinct
    // collapses them one stage later.
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val directed =
        if (large) e.select(col("x").as("u"), col("y").as("v"))
          .union(e.select(col("y").as("u"), col("x").as("v")))
        else e.select(greatest(col("x"), col("y")).as("u"),
          least(col("x"), col("y")).as("v"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      val dm = directed.withColumn("m",
        least(min(col("v")).over(w), col("u")))
      val nbrOut = dm
        .filter(if (large) col("v") > col("u") else col("v") =!= col("m"))
        .select(col("v").as("x"), col("m").as("y"))
      if (large) rep(nbrOut)
      else rep(nbrOut.union(
          dm.filter(col("u") =!= col("m"))
            .select(col("u").as("x"), col("m").as("y")))
        .distinct())
    }

    // PARTITION-LOCAL CONTRACTION pre-pass: one narrow (shuffle-free)
    // union-find over each edge partition replaces the partition's
    // edge set with the equivalent star set (node → min-id local
    // root). Connectivity is preserved exactly — each partition's
    // edges are swapped for a connectivity-equivalent set, and the
    // union of equivalents is equivalent; nodes spanning partitions
    // keep distinct per-partition roots that the global loop then
    // merges. Output is deterministic (root = min id of the local
    // component, order-independent) and never larger than the input
    // (a k-node local component has ≥ k-1 edges, its star has exactly
    // k-1). The payoff is ROUND COUNT: any structure that is locally
    // contiguous (chains/meshes laid out by id range, near-dup
    // clusters arriving together) collapses to depth ≤ 2 before the
    // first global round — q142's 9-round chain graph converges in 3
    // rounds after this pass. At 100 TB this is the standard first
    // move (GraphX/GraphFrames do the same): it costs one scan, no
    // shuffle, BOUNDED memory (node cap below), and can only shrink
    // the edge list the global rounds shuffle.
    //
    // MEMORY CAP: the map holds one entry per distinct node seen in
    // the partition — unbounded, that is O(partition nodes) executor
    // heap, and a dense or badly-split partition could OOM a task the
    // shuffle-only formulation never would. The pre-pass is an
    // OPTIMIZATION (any subset of edges may be contracted; the rest
    // pass through unchanged and the global rounds absorb them), so
    // once the map reaches [[LocalUnionFindMaxNodes]] edges touching
    // any NEW node stream through verbatim — lazily, never buffered —
    // while edges between already-tracked nodes still contract.
    val contracted = raw.filter(col("x") =!= col("y"))
      .select(col("x"), col("y")).as[(Long, Long)]
      .mapPartitions(contractPartition(_, LocalUnionFindMaxNodes))
      .toDF("x", "y")
    // lazy: the loop-entry isEmpty check materializes it
    var e = rep(contracted
      .select(greatest(col("x"), col("y")).as("x"),
        least(col("x"), col("y")).as("y"))
      .distinct()).localCheckpoint(false)
    var iter = 0
    var converged = e.isEmpty
    val debug = sys.props.contains("graft.cc.debug")
    while (!converged && iter < maxIter) {
      val tR = System.nanoTime()
      // LAZY localCheckpoint (same reasoning as [[components]]): the
      // star-forest fixpoint aggregate below is the materializing
      // action, so both phases + the convergence check run as ONE job
      // per round instead of checkpoint-job + check-job. On this
      // O(log n) loop of KB-size stages the job count IS the cost —
      // merging the two jobs cut q142 bench wall ~40%.
      val next = phase(phase(e, large = true), large = false)
        .localCheckpoint(false)
      val tP = System.nanoTime()
      // Fixpoint test: a distinct edge list is a fixpoint of BOTH
      // phases iff it is a STAR FOREST — every x is a child of exactly
      // one root and no node is both child and root (stars reproduce
      // themselves under either phase; any child-of-child or
      // double-parent edge changes under one of them). Checking the
      // CURRENT round's output directly costs one aggregate job and
      // detects convergence a full round EARLIER than comparing
      // successive edge sets (which must re-run a round to observe
      // "nothing changed") — on an O(log n)-round loop of tiny stages
      // that last round is pure overhead.
      // SINGLE-SCAN formulation (explode, not a union of two selects
      // over `next`): a union would plan the whole phase subtree twice,
      // and with the lazy checkpoint above that means computing every
      // partition twice in one job (measured: the union form erased
      // the lazy-checkpoint win entirely, with block-manager re-add
      // races as the tell). One scan → each partition computes once,
      // caches once, and the lineage cut rides the same job.
      converged = next
        .select(explode(array(
          struct(col("x").as("n"), lit(1L).as("cx"), lit(0L).as("cy")),
          struct(col("y").as("n"), lit(0L).as("cx"), lit(1L).as("cy"))))
          .as("occ"))
        .select(col("occ.n").as("n"), col("occ.cx").as("cx"),
          col("occ.cy").as("cy"))
        .groupBy("n").agg(sum("cx").as("nx"), sum("cy").as("ny"))
        .filter(col("nx") > 1L || (col("nx") > 0L && col("ny") > 0L))
        .isEmpty
      if (debug)
        System.err.println(f"[cc] round $iter phases ${(tP - tR) / 1e9}%.2f s" +
          f" check ${(System.nanoTime() - tP) / 1e9}%.2f s")
      e = next
      iter += 1
    }
    // converged edges are (child, root) stars; roots label themselves
    val labeled = e.select(col("x").as("id"), col("y").as("comp"))
    val roots = nodes.join(labeled.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    (labeled.union(roots), iter)
  }
}
