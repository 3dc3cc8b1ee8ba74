package graft.queries

import graft.Tables
import graft.timeseries.TimeSeriesOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Verifiable queries for the TimeSeries algebra (SURVEY.md §2.1/§2.3–2.5:
  * S1/S2, J1/J2/J3, A1/A2, A13, P6/P7, O10) over the driver testdata's
  * `events` table, with DuckDB oracles.
  */
object TimeSeriesQueries extends QueryModule {

  private val STEP = 3600L
  private val SER = Tables.seriesSql

  /** Shared oracle CTE: series → per-sid dense hour grid (nulls explicit). */
  private val denseCte =
    s"""WITH series AS ($SER),
       |b AS (SELECT sid, MIN(ts) AS t0, MAX(ts) AS t1 FROM series GROUP BY 1),
       |g AS (SELECT sid, UNNEST(range(t0, t1 + $STEP, $STEP)) AS ts FROM b),
       |d AS (SELECT g.sid, g.ts, s.value FROM g LEFT JOIN series s USING (sid, ts))""".stripMargin

  private def seriesDf(spark: SparkSession, dir: String) = Tables.series(spark, dir)
  private def denseDf(spark: SparkSession, dir: String) =
    dense(seriesDf(spark, dir), STEP)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_dense_grid" -> ((s, d) => denseDf(s, d)),

    // Interpolated midpoints can land exactly on .xxxx5 (4-decimal inputs,
    // weight 1/2); Spark HALF_UP vs DuckDB float rounding disagree there, so
    // both sides nudge by 1e-9 off the boundary before rounding.
    "ts_interpolate" -> ((s, d) =>
      interpolate(denseDf(s, d)).withColumn("value", round(col("value") + lit(1e-9), 4))),

    "ts_merge_sum" -> ((s, d) => {
      val ds = denseDf(s, d)
      mergeSum(ds.filter(col("sid") === "click"), ds.filter(col("sid") === "view"))
        .withColumn("value", round(col("value"), 4))
    }),

    "ts_merge_sum_n" -> ((s, d) =>
      mergeSumN(Seq("click", "view", "purchase", "signup", "error")
        .map(t => denseDf(s, d).filter(col("sid") === t)))),

    "ts_merge_overlay" -> ((s, d) => {
      val ser = seriesDf(s, d)
      mergeOverlay(Seq(ser.filter(col("sid") === "click"),
                       ser.filter(col("sid") === "view")), STEP)
        .withColumn("value", round(col("value") + lit(1e-9), 4))
    }),

    "ts_agg" -> ((s, d) => tsAgg(denseDf(s, d))),

    "ts_slice" -> ((s, d) =>
      graft.timeseries.TimeSeriesOps.slice(denseDf(s, d), 1704844800L, 1705708800L)),

    "ts_index_slice" -> ((s, d) => subSample(denseDf(s, d), 100, 200)),

    "ts_resample" -> ((s, d) => resample(denseDf(s, d), rate = 3, limit = 50)),

    "ts_first_last" -> ((s, d) => firstLast(seriesDf(s, d))),

    "ts_csv_roundtrip" -> ((s, d) => {
      // Scratch path is per-scale-factor so interleaved runs at different
      // SFs can't read each other's round-trip data.
      val path = s"target/graft-tmp/csv_click_${new java.io.File(d).getName}"
      toCsv(denseDf(s, d).filter(col("sid") === "click").select("ts", "value"), path)
      fromCsv(s, path)
    }),

    // S3 — the ×5-generator CSV scan: read the workload CSV and scale by
    // the generator count (reference analytics/app/prepare_model.py:50-63
    // `value *= 5`).
    "s3_csv_x5" -> ((s, d) => {
      val path = s"target/graft-tmp/csv_click_s3_${new java.io.File(d).getName}"
      toCsv(denseDf(s, d).filter(col("sid") === "click").select("ts", "value"), path)
      fromCsv(s, path).withColumn("value", round(col("value") * 5, 4))
    }))

  def oracles: Map[String, String] = Map(
    "ts_dense_grid" -> s"$denseCte SELECT sid, ts, value FROM d",

    "ts_interpolate" ->
      s"""$denseCte,
         |i AS (SELECT sid, ts, value,
         |  last_value(value IGNORE NULLS) OVER wp AS pv,
         |  last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
         |  first_value(value IGNORE NULLS) OVER wn AS nv,
         |  first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
         |  FROM d
         |  WINDOW wp AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT sid, ts, ROUND(CASE WHEN value IS NOT NULL THEN value
         |  WHEN pv IS NULL THEN nv
         |  WHEN nv IS NULL THEN pv
         |  ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END + 1e-9, 4) AS value
         |FROM i""".stripMargin,

    "ts_merge_sum" ->
      s"""$denseCte,
         |a AS (SELECT ts, value AS va FROM d WHERE sid = 'click'),
         |bb AS (SELECT ts, value AS vb FROM d WHERE sid = 'view')
         |SELECT COALESCE(a.ts, bb.ts) AS ts,
         |  ROUND(CASE WHEN va IS NULL AND vb IS NULL THEN NULL
         |        ELSE COALESCE(va, 0) + COALESCE(vb, 0) END, 4) AS value
         |FROM a FULL OUTER JOIN bb ON a.ts = bb.ts""".stripMargin,

    "ts_merge_sum_n" ->
      s"""$denseCte
         |SELECT ts, CASE WHEN COUNT(value) = 0 THEN NULL
         |  ELSE ROUND(SUM(value), 4) END AS value
         |FROM d GROUP BY ts""".stripMargin,

    "ts_merge_overlay" ->
      s"""WITH series AS ($SER),
         |inp AS (
         |  SELECT ts, value, 0 AS src FROM series WHERE sid = 'click'
         |  UNION ALL
         |  SELECT ts, value, 1 AS src FROM series WHERE sid = 'view'),
         |ends AS (SELECT *, MAX(ts) OVER (PARTITION BY src) AS src_end FROM inp),
         |picked AS (SELECT ts, value FROM (
         |  SELECT ts, value,
         |    row_number() OVER (PARTITION BY ts ORDER BY src_end DESC, src DESC) AS rk
         |  FROM ends) WHERE rk = 1),
         |bnd AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM picked),
         |grid AS (SELECT UNNEST(range(t0, t1 + $STEP, $STEP)) AS ts FROM bnd),
         |d AS (SELECT grid.ts, picked.value FROM grid LEFT JOIN picked USING (ts)),
         |i AS (SELECT ts, value,
         |  last_value(value IGNORE NULLS) OVER wp AS pv,
         |  last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
         |  first_value(value IGNORE NULLS) OVER wn AS nv,
         |  first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
         |  FROM d
         |  WINDOW wp AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT ts, ROUND(CASE WHEN value IS NOT NULL THEN value
         |  WHEN pv IS NULL THEN nv
         |  WHEN nv IS NULL THEN pv
         |  ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END + 1e-9, 4) AS value
         |FROM i""".stripMargin,

    "ts_agg" ->
      s"""$denseCte
         |SELECT sid,
         |  ROUND(${Sql.decSumSql("value")} / COUNT(value) + 1e-9, 4) AS avg_value,
         |  ROUND(MIN(value), 4) AS min_value,
         |  ROUND(MAX(value), 4) AS max_value,
         |  CASE WHEN COUNT(value) = 0 THEN NULL
         |       ELSE ROUND(${Sql.decSumSql("value")}, 4) END AS sum_value,
         |  ROUND(LEAST(MIN(value), 0), 4) AS min_clamped,
         |  ROUND(GREATEST(MAX(value), 0), 4) AS max_clamped,
         |  COUNT(value) AS n_obs
         |FROM d GROUP BY sid""".stripMargin,

    "ts_slice" ->
      s"$denseCte SELECT sid, ts, value FROM d WHERE ts BETWEEN 1704844800 AND 1705708800",

    "ts_index_slice" ->
      s"""$denseCte,
         |p AS (SELECT sid, ts, value,
         |  row_number() OVER (PARTITION BY sid ORDER BY ts) - 1 AS pos FROM d)
         |SELECT sid, ts, value, pos FROM p WHERE pos >= 100 AND pos < 200""".stripMargin,

    "ts_resample" ->
      s"""$denseCte,
         |p AS (SELECT sid, ts, value,
         |  row_number() OVER (PARTITION BY sid ORDER BY ts DESC) AS rn FROM d)
         |SELECT sid, ts, value, (rn - 1) // 3 AS pos FROM p
         |WHERE (rn - 1) % 3 = 0 AND rn <= 148""".stripMargin,

    "ts_first_last" ->
      s"""WITH series AS ($SER)
         |SELECT sid, MIN(ts) AS first_ts, min_by(value, ts) AS first_value,
         |       MAX(ts) AS last_ts, max_by(value, ts) AS last_value
         |FROM series GROUP BY sid""".stripMargin,

    "ts_csv_roundtrip" ->
      s"$denseCte SELECT ts, value FROM d WHERE sid = 'click'",

    "s3_csv_x5" ->
      s"""$denseCte
         |SELECT ts, ROUND(value * 5, 4) AS value FROM d WHERE sid = 'click'""".stripMargin)
}
