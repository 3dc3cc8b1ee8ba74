package graft.streaming

import graft.metrics.MetricOps
import graft.models.CandidateOps
import graft.sources.ProfilesStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The reference's resident 60 s / 600 s optimization loop
  * (reference execution/phoebe/Graph.java:215-283, SURVEY.md §3.3) as
  * Structured Streaming driver logic: metrics arrive as a stream,
  * `foreachBatch` appends them to the durable metrics store, and every
  * `evalEveryBatches`-th batch runs one evaluation tick over the stored
  * history — trailing-window averages (A3), the backpressure rule (M10
  * over M7 slopes), and the rescale decision (M13) — reporting a decision
  * row, mirroring the reference's evalInt gate (60 s polls, act per
  * 600 s).
  *
  * State layout matches the reference: durable history in a store (their
  * SQLite, here parquet), decision state on the driver; the per-tick
  * analytics are full Spark plans over the stored history, so the loop
  * scales with the metrics volume.
  */
object OptimizeLoop {

  /** One evaluation over the accumulated metric history (long format:
    * sid ∈ {latency, throughput, conslag, backpressure}, ts, value). */
  def evaluateTick(history: DataFrame, step: Long,
                   avgWindowPoints: Int, currentScaleOut: Long,
                   candidateBest: Long): (Double, Double, Boolean, Long, Boolean) = {
    def series(name: String) = history.filter(col("sid") === name).drop("sid")
    val trail = MetricOps.trailingAvg(history, step, avgWindowPoints)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val avgLat = trail.getOrElse("latency", Double.NaN)
    val avgThr = trail.getOrElse("throughput", Double.NaN)
    val bck = MetricOps.backpressureRule(
      series("latency"), series("conslag"), series("backpressure")).head
    val isBck = bck.getBoolean(3)
    val slopePositive = bck.getDouble(1) > 0
    val (best, rescale) = CandidateOps.rescaleDecision(
      bestRec = candidateBest, bestLat = candidateBest, isBestCandidate = None,
      slope = if (slopePositive) 1.0 else -1.0,
      currentSo = currentScaleOut, currentValid = !isBck)
    (avgLat, avgThr, isBck, best, rescale)
  }

  /** Attach the loop to a metrics stream. Decisions are delivered to
    * `onDecision(batchId, avgLat, avgThr, isBck, best, rescale)`. */
  def attach(metrics: DataFrame, storePath: String, step: Long,
             avgWindowPoints: Int, evalEveryBatches: Long,
             currentScaleOut: Long, candidateBest: Long,
             trigger: Trigger = Trigger.ProcessingTime("60 seconds"))(
      onDecision: (Long, Double, Double, Boolean, Long, Boolean) => Unit): DataStreamWriter[Row] =
    metrics.writeStream.trigger(trigger).foreachBatch {
      (batch: DataFrame, id: Long) =>
        ProfilesStore.append(batch, storePath)
        if ((id + 1) % evalEveryBatches == 0) {
          val hist = ProfilesStore.read(batch.sparkSession, storePath)
          val (lat, thr, bck, best, resc) = evaluateTick(
            hist, step, avgWindowPoints, currentScaleOut, candidateBest)
          onDecision(id, lat, thr, bck, best, resc)
        }
    }
}
