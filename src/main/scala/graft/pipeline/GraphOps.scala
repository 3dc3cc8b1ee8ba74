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

  /** Rank scale: one rank point = 10^9 nano-rank units. */
  val RankUnit = 1000000000L

  /** PAGERANK centrality over an undirected (src, dst) pair graph —
    * which documents sit at the CENTER of a near-duplicate neighborhood
    * (high-rank nodes are template hubs: boilerplate families, mirror
    * clusters) vs merely touching one. The link-analysis companion to
    * [[connectedComponents]]: CC says "same cluster", PageRank says "how
    * central inside it".
    *
    * EXACT-INTEGER fixed-iteration variant: ranks live in nano-rank
    * units (`RankUnit`), each round computes
    *     r' = 0.15·U + (17 · Σ_in (r div deg)) div 20
    * — damping 0.85 as the rational 17/20, every operation a long
    * integer op, so the result is bit-identical in any engine and the
    * DuckDB oracle replays all `iters` rounds CTE-for-CTE (no float
    * drift to tolerate). The per-contribution floor loses < deg
    * nano-units — immaterial for a centrality ORDERING and fully
    * deterministic. Long overflow needs Σ ranks ≥ 2^63/17 ≈ 5·10^8 rank
    * points, i.e. half a billion graph nodes — document far below the
    * corpus bound (a dup graph is a vanishing fraction of its corpus).
    *
    * Per round: one equi-join of ranks onto the symmetrized edge list +
    * one sum-aggregate, both shuffling on node id (the CC shape — no
    * quadratic blowup on hot nodes), lineage truncated per round with an
    * eager localCheckpoint. Symmetric graphs have no dangling nodes
    * (every edge endpoint has out-degree ≥ 1), so no leaked-mass term.
    * Output: (doc_id, rank_nano, rank) for every node in an edge. */
  def pagerank(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).persist()
    val sym = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    sym.count() // materialize before unpersisting the un-symmetrized edges
    e.unpersist()
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    var ranks = deg.withColumn("r", lit(RankUnit)).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contrib = sym
        .join(ranks.select(col("id").as("src"), col("deg"), col("r")), Seq("src"))
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inr"))
      ranks = ranks.select(col("id"), col("deg"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(RankUnit * 3 / 20) +
            expr("(17 * coalesce(inr, CAST(0 AS BIGINT))) div 20")).as("r"))
        .localCheckpoint(true)
    }
    sym.unpersist()
    ranks.select(col("id").as("doc_id"), col("r").as("rank_nano"),
      round(col("r").cast("double") / RankUnit + lit(1e-9), 6).as("rank"))
  }
}
