package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step that turns pairwise near-duplicate VERDICTS into duplicate
  * CLUSTERS (pick one representative per component) at corpus scale.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors, then additionally the label OF that label (pointer
  * doubling) — label chains halve per round, so the fixpoint arrives in
  * O(log diameter) rounds rather than diameter. Duplicate graphs are
  * dense clumps with tiny diameters anyway (docs in a near-dup cluster
  * are mostly pairwise-similar); `maxIter` bounds adversarial chains
  * (now needing diameter > 2^30 to hit), and hitting it raises rather
  * than returning a half-merged labeling. Per round:
  * one equi-join of labels onto the symmetrized edge list + one
  * min-aggregate — both shuffle on node id, no quadratic blowup on hot
  * nodes. Lineage is truncated every round with an eager
  * localCheckpoint, the standard guard against the plan doubling per
  * iteration in any DataFrame loop. Convergence is detected with a
  * monotonicity trick: labels only ever decrease, so the label SUM is
  * strictly decreasing until the fixpoint — one cheap aggregate per
  * round instead of a change-counting join.
  */
object GraphOps {

  /** Components of the undirected graph given as (src, dst) long pairs.
    * Returns (id, comp_id): every node that appears in an edge, labeled
    * with the smallest node id reachable from it.
    *
    * Two regimes, same labeling: at or below `driverMaxEdges` edges the
    * component structure is solved with union-find ON THE DRIVER (a
    * near-dup graph is a vanishing fraction of its corpus — 10^2 edges
    * from 10^4 docs here; even a 100 TB corpus's dup graph usually fits —
    * and a driver pass replaces ~4 shuffle rounds of per-iteration
    * scheduling with one collect of O(edges) longs). Above it, the
    * distributed min-label propagation below takes over — the path that
    * never holds the graph in one heap.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
                          driverMaxEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    // materialize the edge list ONCE before symmetrizing: the two union
    // branches are otherwise independent copies of the (often expensive —
    // LSH pair mining) edge plan, and Spark does no cross-branch subtree
    // elimination (measured 2x the full pair-mining cost without this)
    val e = edges.select(col("src"), col("dst")).persist()
    val sym = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val nEdges = sym.count()
    e.unpersist()
    if (nEdges <= driverMaxEdges) {
      import spark.implicits._
      val es = sym.as[(Long, Long)].collect()
      sym.unpersist()
      // union-find, smaller root wins: every root is its component's min.
      // find is ITERATIVE (walk to root, second pass compresses) — the
      // smaller-root union rule can build O(n)-deep chains under
      // adversarial edge order, and a recursive find would overflow the
      // driver stack at the 2M-edge bound; compression keeps amortized
      // depth near-constant without giving up the root-is-min invariant
      // that union-by-rank would break.
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = parent.getOrElseUpdate(x, x)
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val p = parent(c); parent(c) = r; c = p }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toSeq.sorted.map(n => (n, find(n)))
      return labels.toDF("id", "comp_id")
    }
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp_id", col("id"))
      .localCheckpoint(true)
    // an empty edge set has an empty (already-converged) labeling; the
    // loop's null label-sum would otherwise NPE
    if (labels.head(1).isEmpty) { sym.unpersist(); return labels }
    var lastSum = labels.agg(sum(col("comp_id").cast("decimal(30,0)"))).head.getDecimal(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neigh = sym
        .join(labels.select(col("id").as("dst"), col("comp_id").as("ncomp")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("ncomp")).as("nmin"))
      val stepped = labels
        .join(neigh, Seq("id"), "left")
        .select(col("id"),
          least(col("comp_id"), coalesce(col("nmin"), col("comp_id"))).as("comp_id"))
        .localCheckpoint(true) // feeds BOTH sides of the doubling self-join
      // pointer doubling: also take the label OF my label (every comp_id
      // is itself a node id, so the lookup is total). Neighbor-min alone
      // needs diameter rounds; label-of-label halves every label chain
      // per round, so convergence is O(log diameter) and maxIter=30 is
      // unreachable for any real graph (2^30-diameter chains).
      val next = stepped
        .join(stepped.select(col("id").as("comp_id"), col("comp_id").as("gcomp")),
          Seq("comp_id"), "left")
        .select(col("id"),
          least(col("comp_id"), coalesce(col("gcomp"), col("comp_id"))).as("comp_id"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("comp_id").cast("decimal(30,0)"))).head.getDecimal(0)
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
