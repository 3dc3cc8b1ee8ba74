package graft.queries

import graft.Tables
import graft.pipeline.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-log shaping queries: gap sessionization and the per-key as-of
  * join of events against the metric series — both single-shuffle designs
  * (see [[graft.pipeline.EventOps]]), both with exact DuckDB oracles
  * (the as-of oracle uses DuckDB's native ASOF JOIN, `<=` variant).
  */
object EventQueries extends QueryModule {

  private val SER = Tables.seriesSql

  /** 30-minute inactivity gap — the classic web-analytics default. */
  private val Gap = 1800L

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> ((s, d) =>
      EventOps.sessionize(
        ev(s, d).select(col("user_id"),
          unix_timestamp(col("ts")).as("ts"), col("value")),
        Gap)),

    // each event picks the metric observation of ITS OWN series
    // (sid = event_type) with the greatest ts <= event ts
    "events_asof_metric" -> ((s, d) =>
      EventOps.asofJoin(
        ev(s, d).select(col("event_id"), col("event_type").as("sid"),
          unix_timestamp(col("ts")).as("ts")),
        Tables.series(s, d),
        "sid")
        .select("event_id", "sid", "ts", "asof_ts", "asof_value")))

  def oracles: Map[String, String] = Map(
    // SUM(int) in DuckDB is HUGEINT -> cast session_seq back to BIGINT
    "events_sessionize" ->
      s"""WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts, value
         |           FROM events),
         |b AS (SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > $Gap
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_seq FROM b)
         |SELECT user_id, session_seq,
         |  MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  COUNT(*) AS n_events,
         |  ROUND(${Sql.decSumSql("value")}, 4) AS total_value
         |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    "events_asof_metric" ->
      s"""WITH series AS ($SER),
         |e AS (SELECT event_id, event_type AS sid,
         |        CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts FROM events)
         |SELECT e.event_id, e.sid, e.ts, m.ts AS asof_ts, m.value AS asof_value
         |FROM e ASOF LEFT JOIN series m
         |  ON e.sid = m.sid AND e.ts >= m.ts""".stripMargin)
}
