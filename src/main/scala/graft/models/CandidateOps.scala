package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-set operators: J6/M9 pairwise-vote clustering validity, O5
  * first-valid selection, O6 tolerance-argmin fold, M13 rescale decision,
  * P9 candidate membership.
  */
object CandidateOps {

  /** J6 + M9 — clustering validity (reference utils/Evaluate.java:13-39):
    * each candidate's last value is compared with every other's; a vote
    * where |(curr − that)/that| < distance; candidates with the maximum
    * vote count form the valid cluster. Cross join of a TINY candidate
    * relation (≤ scale-out range), never of fact data. */
  def clusterValidity(lastVals: DataFrame, distance: Double = 2.0): DataFrame = {
    val a = lastVals.select(col("scaleout").as("so_a"), col("last_value").as("v_a"))
    val b = lastVals.select(col("scaleout").as("so_b"), col("last_value").as("v_b"))
    val votes = a.crossJoin(b)
      .filter(col("so_a") =!= col("so_b"))
      .groupBy(col("so_a"), col("v_a"))
      // try_divide: a zero reference value must score a no-vote (null →
      // otherwise-0, same as the oracle's inf → false), not raise an
      // ANSI divide-by-zero
      .agg(sum(when(abs(try_divide(col("v_a") - col("v_b"), col("v_b"))) < distance, 1)
        .otherwise(0)).as("votes"))
    val wAll = Window.partitionBy(col("so_a") % 1)
    votes
      .withColumn("max_votes", max(col("votes")).over(wAll))
      .select(col("so_a").as("scaleout"), col("v_a").as("last_value"),
        col("votes"), (col("votes") === col("max_votes")).as("is_valid"))
  }

  /** O6 — the reference's order-dependent 5%-tolerance argmin fold
    * (LatencyResponse.java:40-59): walk candidates in ascending scale-out
    * order; take a candidate if it is within 5% relative difference AND
    * has a smaller scale-out, or if it differs by more than 5% AND is
    * strictly better. Driver-side exact fold over the (tiny, collected)
    * candidate list — the fold is non-associative by design
    * (SURVEY.md §4.3). */
  def bestByTolerantArgmin(cands: Seq[(Long, Double)], currentSo: Long,
                           currentVal: Double): (Long, Double) = {
    var so = currentSo
    var v = currentVal
    cands.sortBy(_._1).foreach { case (cso, cv) =>
      val rel = math.abs((v - cv) / cv)
      if (rel < 0.05 && cso < so) { so = cso; v = cv }
      else if (rel > 0.05 && cv < v) { so = cso; v = cv }
    }
    (so, v)
  }

  /** M13 — rescale decision (reference Graph.java:256-277,
    * LatencyResponse.java:61-73): maxScaleOut = max(bestByRecTime,
    * bestByMinLatency); a flagged is_best candidate overrides; if the
    * workload slope is positive and the current scale-out is still valid,
    * stay; rescale only if the target is not within {curr, curr−1,
    * curr−2}. */
  def rescaleDecision(bestRec: Long, bestLat: Long, isBestCandidate: Option[Long],
                      slope: Double, currentSo: Long, currentValid: Boolean): (Long, Boolean) = {
    val maxSo = math.max(bestRec, bestLat)
    var best = isBestCandidate.getOrElse(maxSo)
    if (slope > 0 && currentValid) best = currentSo
    val rescale = best != currentSo && best != currentSo - 1 && best != currentSo - 2
    (best, rescale)
  }
}
