package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step that turns pairwise near-duplicate VERDICTS into duplicate
  * CLUSTERS (pick one representative per component) at corpus scale.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors; a fixpoint is reached after `diameter` rounds. Duplicate
  * graphs are dense clumps with tiny diameters (docs in a near-dup
  * cluster are mostly pairwise-similar), so the loop terminates in a
  * handful of rounds; `maxIter` bounds adversarial chains, and hitting
  * it raises rather than returning a half-merged labeling. Per round:
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
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
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
      val next = labels
        .join(neigh, Seq("id"), "left")
        .select(col("id"),
          least(col("comp_id"), coalesce(col("nmin"), col("comp_id"))).as("comp_id"))
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
