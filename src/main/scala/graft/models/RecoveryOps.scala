package graft.models

import graft.metrics.AggOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** M5 — recovery-time estimation via the iterative Simpson catch-up loop,
  * and M12 — candidate finalization (reference
  * recoverytime/models.py:41-116, common/schemes.py:30-68).
  *
  * Loop semantics per candidate scale-out (capacity = M2 prediction):
  * interval₀ = [lastTs − checkpoint, lastTs + ⌈downtime⌉]; each step
  * integrates the workload over the interval (composite Simpson, A12),
  * divides by capacity → time_comp; if the slice is empty stop; else
  * accumulate, and while time_comp ≥ 1 continue with
  * [end, end + ⌈time_comp⌉]. Recovery time = Σ time_comp + downtime.
  *
  * Scale design: the DRIVER holds only O(candidates) interval state (the
  * reference does the same loop in Python per candidate); every
  * integration is ONE distributed Spark aggregation over the workload for
  * ALL active candidates at once (broadcast the tiny interval list, join,
  * per-candidate Simpson). Iterations are capped at `maxIters` — a
  * declared engine parameter that makes the computation reproducible in
  * the unrolled SQL oracle; the reference's loop is unbounded but
  * converges in 2–5 iterations on real workloads (SURVEY.md §2.6 M5).
  */
object RecoveryOps {

  /** Per-candidate catch-up loop. `workload`: (ts, value) null-free
    * uniform grid of step `h` (past ∪ forecast); `anchorTs`: the PAST
    * workload's last timestamp (interval origin, reference
    * recoverytime/models.py:92-96); `capacity`: (scaleout, capacity).
    * Returns (scaleout, capacity, catch_up, n_iters). */
  def catchUp(spark: SparkSession, workload: DataFrame, capacity: DataFrame,
              anchorTs: Long, h: Long, checkpoint: Long, downtime: Double,
              maxIters: Int = 12): DataFrame = {
    import spark.implicits._
    val lastTs = anchorTs
    val end0 = lastTs + math.ceil(downtime).toLong
    // the workload plan is re-joined every iteration: materialize once
    val wl = workload.persist()
    // driver state: scaleout -> (capacity, start, end, sumTc, iters, active)
    var state = capacity.select("scaleout", "capacity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1)
      .map { case (so, cap) => (so, cap, lastTs - checkpoint, end0, 0.0, 0, true) }

    var iter = 0
    while (iter < maxIters && state.exists(_._7)) {
      val active = state.filter(_._7)
      val intervals = active.map(s => (s._1, s._3, s._4)).toSeq
        .toDF("scaleout", "st", "en")
      val sliced = wl.join(broadcast(intervals),
        col("ts").between(col("st"), col("en")))
      val integrals = AggOps.simpsonRaw(sliced, h, Seq("scaleout"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      state = state.map { case s @ (so, cap, st, en, sum, it, act) =>
        if (!act) s
        else integrals.get(so) match {
          case None => (so, cap, st, en, sum, it, false) // empty slice: stop
          case Some((_, integral)) =>
            val tc = integral / cap
            val cont = tc >= 1.0
            val nextEn = en + math.ceil(tc).toLong
            (so, cap, en, if (cont) nextEn else en, sum + tc, it + 1, cont)
        }
      }
      iter += 1
    }
    wl.unpersist()
    state.toSeq.map { case (so, cap, _, _, sum, it, _) => (so, cap, sum, it) }
      .toDF("scaleout", "capacity", "catch_up", "n_iters")
  }

  /** M12 — finalize candidates: value = catch_up + downtime, is_valid ⇐
    * value < restriction ∧ scaleout ∈ previously-valid, is_best = first
    * valid by ascending scale-out, is_current flag
    * (reference common/schemes.py:30-68; O3/O5 orderings). */
  def finalize(cands: DataFrame, downtime: Double, restriction: Double,
               currentScaleOut: Int,
               previouslyValid: Option[Seq[Long]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withVal = cands
      .withColumn("recovery_time", col("catch_up") + lit(downtime))
      .withColumn("is_valid",
        col("recovery_time") < restriction &&
          (previouslyValid match {
            case Some(pv) => col("scaleout").isin(pv: _*)
            case None => lit(true)
          }))
    // tiny candidate relation: the global window over ≤ max-scale-out rows
    // is bounded by design, keyed to keep the partition spec non-empty
    val w = Window.partitionBy(col("scaleout") % 1).orderBy(col("scaleout"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withVal
      .withColumn("is_best",
        col("is_valid") && count(when(col("is_valid"), 1)).over(w) === 0)
      .withColumn("is_current", col("scaleout") === currentScaleOut)
  }
}
