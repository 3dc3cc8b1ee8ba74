package graft.streaming

import graft.metrics.MetricOps
import graft.models.{ArEnsemble, CandidateOps}
import graft.sources.ProfilesStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    // slopes are null while a series has <2 points (undefined fit):
    // treat as not-backpressured / flat rather than NPE-ing the stream
    val isBck = !bck.isNullAt(3) && bck.getBoolean(3)
    // M13's slope input is the WORKLOAD (throughput) forecast slope (the
    // m13 query's semantics — M11 over the workload series), not the
    // latency slope the backpressure rule computes
    val wlRow = MetricOps.forecastSlope(
      series("throughput").withColumn("sid", lit("throughput"))).head(1)
    val slopePositive = wlRow.nonEmpty && !wlRow.head.isNullAt(2) &&
      wlRow.head.getDouble(2) > 0
    val (best, rescale) = CandidateOps.rescaleDecision(
      bestRec = candidateBest, bestLat = candidateBest, isBestCandidate = None,
      slope = if (slopePositive) 1.0 else -1.0,
      currentSo = currentScaleOut, currentValid = !isBck)
    (avgLat, avgThr, isBck, best, rescale)
  }

  /** M1 forecaster tick (reference analytics/app/workload/models.py:166-183
    * `predict()`: update each model with the new observations, persist the
    * updated state, forecast): maintains the incremental [[ArEnsemble]]
    * state under `stateDir` — first tick fits, later ticks `update()` with
    * only `newObs` — and returns the per-model forecast frame. The state
    * swap is write-next → delete → rename (a parquet table can't be
    * overwritten while being read). */
  def forecastTick(spark: SparkSession, stateDir: String, newObs: DataFrame,
                   models: Int = 20, horizon: Int = 20): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(s"$stateDir/m1_state")
    val nxt = new Path(s"$stateDir/m1_state_next")
    // crash recovery: a death between delete(cur) and rename(nxt, cur)
    // leaves only the fully-written next state — promote it instead of
    // silently refitting from one batch and discarding all prior moments
    if (!fs.exists(cur) && fs.exists(nxt) &&
        require2(fs.rename(nxt, cur), s"promote $nxt")) ()
    // an empty (or missing-yet-empty) state must NEVER be written: a
    // fitState over zero observations would persist an empty frame, and
    // every later updateState over it stays empty — the store would be
    // permanently bricked while the cursor advances past real data. An
    // empty first tick simply waits for observations.
    val haveState = fs.exists(cur) &&
      spark.read.parquet(cur.toString).head(1).nonEmpty
    if (!haveState && newObs.head(1).isEmpty)
      return ArEnsemble.forecastFromState(
        ArEnsemble.fitState(newObs, models).limit(0), horizon)
    val st =
      if (haveState)
        ArEnsemble.updateState(spark.read.parquet(cur.toString), newObs, models)
      else ArEnsemble.fitState(newObs, models)
    st.write.mode("overwrite").parquet(nxt.toString)
    fs.delete(cur, true)
    require2(fs.rename(nxt, cur), s"swap $nxt -> $cur")
    ArEnsemble.forecastFromState(spark.read.parquet(cur.toString), horizon)
  }

  private def require2(ok: Boolean, what: String): Boolean = {
    require(ok, s"m1 state store: rename failed ($what)"); ok
  }

  /** Restart cursor: the max observation ts the durable M1 state has
    * already consumed (Long.MinValue when no state exists yet). attach()
    * seeds its in-memory cursor from this so a restarted loop never
    * re-feeds consumed history into the additive state. */
  def seedCursor(spark: SparkSession, stateDir: String): Long = {
    val p = new Path(s"$stateDir/m1_state")
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(p)) Some(p)
      else if (fs.exists(new Path(s"$stateDir/m1_state_next")))
        Some(new Path(s"$stateDir/m1_state_next"))
      else None
    existing.map { path =>
      val df = spark.read.parquet(path.toString)
      // states written before the cursor column existed fall back to the
      // grid-only watermark (may re-feed a tail of non-grid points once)
      val c = if (df.columns.contains("seen_ts")) "seen_ts" else "last_ts"
      val r = df.agg(max(col(c))).head
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
    }.getOrElse(Long.MinValue)
  }

  /** Attach the loop to a metrics stream. Decisions are delivered to
    * `onDecision(batchId, avgLat, avgThr, isBck, best, rescale)` AND — the
    * reference's predictions-table parity (managers/DataManager.java:
    * 218-242, one row per tick) — appended durably to
    * `storePath_decisions`. When `forecastDir` is set, each tick also
    * update()s the M1 ensemble with the throughput observations that
    * arrived since the last tick and records the blended next-step
    * forecast in the decision row. */
  def attach(metrics: DataFrame, storePath: String, step: Long,
             avgWindowPoints: Int, evalEveryBatches: Long,
             currentScaleOut: Long, candidateBest: Long,
             trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
             forecastDir: Option[String] = None, forecastModels: Int = 20)(
      onDecision: (Long, Double, Double, Boolean, Long, Boolean) => Unit): DataStreamWriter[Row] = {
    // driver-side bookkeeping, like the reference's last_learned_timestamp:
    // the forecaster must consume each observation exactly once — seeded
    // from the DURABLE state so a restarted loop (new driver, same
    // forecastDir) does not re-feed consumed history into the additive
    // moments (which would silently double-count every sum)
    var lastSeenTs = forecastDir.map(fd => seedCursor(metrics.sparkSession, fd))
      .getOrElse(Long.MinValue)
    metrics.writeStream.trigger(trigger).foreachBatch {
      (batch: DataFrame, id: Long) =>
        ProfilesStore.append(batch, storePath)
        if ((id + 1) % evalEveryBatches == 0) {
          val spark = batch.sparkSession
          val hist = ProfilesStore.read(spark, storePath)
          val (lat, thr, bck, best, resc) = evaluateTick(
            hist, step, avgWindowPoints, currentScaleOut, candidateBest)
          val fNext: Option[Double] = forecastDir.map { fd =>
            val newThr = hist.filter(col("sid") === "throughput" &&
              col("ts") > lastSeenTs).select("ts", "value")
            val mx = newThr.agg(max("ts")).head
            if (!mx.isNullAt(0)) lastSeenTs = math.max(lastSeenTs, mx.getLong(0))
            // the stored value is the BLENDED next-step forecast (EWM
            // span-5 over the ensemble — A10/A17, the value the reference's
            // prediction row records), not a plain model mean
            val wide = forecastTick(spark, fd, newThr, forecastModels, horizon = 1)
            val bRow = ArEnsemble.blendForecast(wide, forecastModels, 1).head(1)
            if (bRow.isEmpty || bRow.head.isNullAt(1)) Double.NaN
            else bRow.head.getDouble(1)
          }
          import spark.implicits._
          // first tick may evaluate an empty history (e.g. an empty
          // initial micro-batch): there is nothing to decide on — skip the
          // decision row instead of NPE-ing the streaming query
          val tickRow = hist.agg(max("ts")).head
          if (!tickRow.isNullAt(0)) {
            val tickTs = tickRow.getLong(0)
            ProfilesStore.append(
              Seq((id, tickTs, lat, thr, bck, best, resc, fNext))
                .toDF("batch_id", "ts", "avg_lat", "avg_thr", "is_bck_pres",
                  "best_scale_out", "rescale", "forecast_next"),
              storePath + "_decisions")
          }
          onDecision(id, lat, thr, bck, best, resc)
        }
    }
  }
}
