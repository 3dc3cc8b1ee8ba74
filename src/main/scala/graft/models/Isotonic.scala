package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration of a discrete classifier
  * score against a binary label — the standard way to turn a ranking score
  * into a probability (Zadrozny & Elkan, KDD'02; the pool-adjacent-
  * violators fit every `CalibratedClassifier` runs).
  *
  * Instead of the sequential PAV pooling loop, this uses the closed-form
  * MINIMAX characterization of the L2 isotonic regression
  * (Robertson–Wright–Dykstra, "Order Restricted Statistical Inference"):
  *
  *     p_i = max_{j ≤ i} min_{k ≥ i} mean(y over score bins j..k)
  *
  * which is PURELY relational — no driver loop, no iteration, no state:
  *
  *   1. ONE data-scale shuffle bins the corpus into (score, n, n_pos) —
  *      integer-exact aggregates, the only pass that touches every row;
  *   2. the minimax runs over the B distinct score bins: a triangle
  *      self-join builds all O(B²) contiguous ranges and an O(B³)
  *      min-then-max resolves every bin — B is the score's cardinality
  *      (a classifier's integer score: tens), so this tail is constant
  *      work on broadcast-sized frames at ANY corpus size.
  *
  * Range means are IEEE divisions of exact integer sums — bit-identical
  * in any engine — so the whole fit (not just a frozen rendering of it)
  * is reproducible by the SQL oracle. Output is one row per present
  * score bin: (score, n, n_pos, p_cal) with p_cal non-decreasing in
  * score, clamped to [0,1] by construction, and rounded at the very end
  * only (comparisons happen on raw doubles in both engines).
  */
object Isotonic {

  /** Fit the calibration map. `scored`: (score: integral bin, y: 0/1). */
  def calibrate(scored: DataFrame): DataFrame = {
    val bins = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    // all contiguous bin ranges j..k with their pooled mean: join each
    // bin into every (j, k) pair that covers it — O(B³) tuples of a
    // broadcast-tiny frame, never data-scale. The broadcast hints are
    // load-bearing: without them the planner has no size estimate for
    // the aggregated bin frame and degrades these non-equi joins to
    // CartesianProduct (one task pair) instead of a bounded nested loop.
    val pairs = bins.select(col("score").as("j"))
      .join(broadcast(bins.select(col("score").as("k"))), col("j") <= col("k"))
    val ranges = pairs
      .join(broadcast(bins), col("score") >= col("j") && col("score") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg((sum(col("n_pos")).cast("double") /
        sum(col("n")).cast("double")).as("avg"))
    // p_i = max_{j<=i} ( min_{k>=i} avg(j..k) )
    val step1 = ranges
      .join(broadcast(bins.select(col("score").as("i"))),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("j"), col("i")).agg(min(col("avg")).as("mn"))
    val pcal = step1.groupBy(col("i")).agg(max(col("mn")).as("p_raw"))
    bins.join(pcal, col("score") === col("i"))
      .select(col("score"), col("n"), col("n_pos"),
        round(col("p_raw") + lit(1e-9), 6).as("p_cal"))
  }

  /** The DuckDB mirror of [[calibrate]] over a scored CTE named `sc`
    * with columns (score, y). */
  def calibrateSql(scCte: String): String =
    s"""$scCte,
       |bins AS (SELECT score, COUNT(*) AS n,
       |    CAST(SUM(y) AS BIGINT) AS n_pos FROM sc GROUP BY score),
       |pairs AS (SELECT b1.score AS j, b2.score AS k
       |  FROM bins b1 JOIN bins b2 ON b1.score <= b2.score),
       |ranges AS (SELECT j, k,
       |    CAST(SUM(n_pos) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS avg
       |  FROM pairs JOIN bins ON score >= j AND score <= k
       |  GROUP BY j, k),
       |step1 AS (SELECT j, i.score AS i, MIN(avg) AS mn
       |  FROM ranges JOIN bins i ON j <= i.score AND k >= i.score
       |  GROUP BY j, i.score),
       |pcal AS (SELECT i, MAX(mn) AS p_raw FROM step1 GROUP BY i)
       |SELECT score, n, n_pos, ROUND(p_raw + 1e-9, 6) AS p_cal
       |FROM bins JOIN pcal ON score = i""".stripMargin
}
