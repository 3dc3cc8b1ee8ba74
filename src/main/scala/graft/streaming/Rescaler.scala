package graft.streaming

import graft.sources.ProfilesStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Rescale EXECUTION — the reference's savepoint → stop → restart-with-
  * new-parallelism dance (reference managers/ClientsManager.java:186-221
  * `restartJob`, driven by the optimize loop at
  * execution/phoebe/Graph.java:266-273 once M13 picks a better
  * scale-out).
  *
  * Structured-Streaming mapping: there is no separate savepoint step —
  * every micro-batch already commits offsets + state to the checkpoint
  * directory, so the checkpoint IS a continuously-maintained savepoint.
  * Rescaling is therefore: graceful `stop()` (the reference's
  * save-then-stop), then start a NEW query over the SAME checkpoint with
  * the new parallelism (the reference's `startJob(savepointPath,
  * parallelism)`). Exactly-once across the restart is the checkpoint
  * contract, which [[graft.StreamingSpec]] asserts end-to-end through a
  * real stop/restart.
  *
  * Parallelism caveat (Flink max-parallelism analog): for STATEFUL
  * queries Spark pins the state-store partition count at first start —
  * across restarts the rescale knob is the executor count
  * (`--num-executors` / dynamic allocation), which a restarted query
  * picks up freely; `spark.sql.shuffle.partitions` only retakes effect
  * for stateless plans. The `start` callback owns that mapping; on
  * local[n] tests it re-plans with a new partition count.
  *
  * Unlike the reference (downtime is the constant 110 s baked into
  * Graph.java:254), the measured stop→first-commit gap of every rescale
  * is recorded durably, so M5's `downtime` input can be the observed
  * average (`avgDowntimeSec`) instead of a constant.
  */
object Rescaler {

  /** Stop `running`, restart via `start(toParallelism)` from the same
    * checkpoint, block until the restarted query commits its first
    * micro-batch, and append one durable rescale event to
    * `storePath_rescales`. Returns (restarted query, measured downtime
    * in ms). `tickTs` stamps the event row (data time, supplied by the
    * caller — the engine never reads wall-clock into query results). */
  def rescale(spark: SparkSession, storePath: String, tickTs: Long,
              running: StreamingQuery, fromParallelism: Int, toParallelism: Int,
              start: Int => StreamingQuery,
              timeoutMs: Long = 120000L): (StreamingQuery, Long) = {
    val t0 = System.nanoTime()
    running.stop()
    // the old query MUST be fully terminated before a new one opens the
    // same checkpoint — starting anyway would race two writers on one
    // offset log (or fail with "checkpoint already in use")
    require(running.awaitTermination(timeoutMs),
      s"rescale: running query did not terminate within ${timeoutMs} ms")
    val restarted = start(toParallelism)
    // downtime ends at the first committed micro-batch of the restarted
    // query (the reference ends it at the job's RUNNING transition;
    // first-commit is the honest Spark equivalent — the job is not
    // "recovered" until it processes again)
    val deadline = t0 + timeoutMs * 1000000L
    while (restarted.lastProgress == null && System.nanoTime() < deadline) {
      restarted.processAllAvailable()
      if (restarted.lastProgress == null) Thread.sleep(20L)
    }
    require(restarted.lastProgress != null,
      s"rescale: restarted query committed no batch within ${timeoutMs} ms")
    val downtimeMs = (System.nanoTime() - t0) / 1000000L
    import spark.implicits._
    ProfilesStore.append(
      Seq((tickTs, fromParallelism.toLong, toParallelism.toLong, downtimeMs))
        .toDF("ts", "from_so", "to_so", "downtime_ms"),
      storePath + "_rescales")
    (restarted, downtimeMs)
  }

  /** Observed mean downtime in seconds over all recorded rescales —
    * M5's `downtime` input once at least one rescale has happened
    * (else fall back to the reference's constant). */
  def avgDowntimeSec(spark: SparkSession, storePath: String): Option[Double] = {
    val p = new org.apache.hadoop.fs.Path(storePath + "_rescales")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(p.toString)
        .agg(avg(col("downtime_ms") / 1000.0)).head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
  }

  /** Recorded rescale history (ts, from_so, to_so, downtime_ms). */
  def history(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath + "_rescales")
}
