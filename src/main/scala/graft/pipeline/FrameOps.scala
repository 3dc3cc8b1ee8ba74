package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-level utilities. */
object FrameOps {

  /** Broadcast a dimension only while its OPTIMIZER-ESTIMATED size fits
    * the session's autoBroadcastJoinThreshold (plan statistics — no
    * action is triggered). The TPC-H proxy dims (customer) stand in for
    * ~100-row reference dims (campaigns) but grow with SF: a forced
    * broadcast() hint would ship 15M rows per executor at sf100, while
    * dropping the hint entirely would lose the broadcast at the small
    * scales where it is right. This guard picks per-plan. */
  def dimBroadcast(df: DataFrame): DataFrame = {
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
      catch { case _: Throwable => 10L * 1024 * 1024 }
    if (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
      broadcast(df)
    else df
  }

  /** P4 — drop columns whose values are ALL null (pandas
    * `dropna(axis='columns', how='all')`, reference wm.py:132). One
    * aggregate pass decides; the projection itself is metadata-only. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.agg(count(lit(1)).as("__rows"),
      df.columns.map(c => count(col(c)).as(c)).toSeq: _*).head
    val dead = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    if (dead.isEmpty) df else df.drop(dead: _*)
  }
}
