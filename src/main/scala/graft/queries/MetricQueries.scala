package graft.queries

import graft.Tables
import graft.metrics.MetricOps
import graft.sources.ProfilesStore
import graft.timeseries.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verifiable queries for the metric layer (SURVEY.md §2: A3–A6, M7, M8,
  * M10, M11) over the events-derived `series` table and the profiles
  * store. The OLS oracles mirror [[MetricOps]]'s exact-decimal closed form
  * term by term — see the FP note there.
  */
object MetricQueries extends QueryModule {

  private val SER = Tables.seriesSql
  private val PRO = Tables.profilesSql
  private val STEP = 3600L

  private def seriesDf(s: SparkSession, d: String) = Tables.series(s, d)

  /** Oracle fit-sums over a relation providing (g, x, y). */
  private def fitSumsSql(from: String, g: String) =
    s"""SELECT $g, COUNT(y) AS n,
       |  CAST(SUM(x) AS DOUBLE) AS sx,
       |  CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
       |  CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,4)))
       |    AS DOUBLE) AS sxy,
       |  CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
       |FROM $from GROUP BY $g""".stripMargin

  // NULLIF denominator: singular designs (n < 2) are NULL, matching
  // MetricOps.withLine — no data group in the corpora hits it, but the
  // predicate semantics must agree between the engines
  private val slopeSql = "(n*sxy - sx*sy) / NULLIF(n*sxx - sx*sx, 0)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m7_slope_intercept" -> ((s, d) => MetricOps.slopeIntercept(seriesDf(s, d))),

    // z-normalized (Pearson) sliding-window similarity search: the last
    // 24 hours of the click series ranked against every contiguous
    // 24-point window of every series — scale/offset-invariant pattern
    // matching over the metric store (the UCR-suite query shape)
    "ts_similarity_search" -> ((s, d) =>
      MetricOps.tsSimilaritySearch(seriesDf(s, d))),

    "m8_validity_regression" -> ((s, d) =>
      MetricOps.validityRegression(
        Tables.profiles(s, d).select(col("scaleout"),
          col("stopts").as("ts"), col("avglat").as("value"), col("expid")),
        Seq("scaleout"), tieCol = "expid")),

    "m10_backpressure_rule" -> ((s, d) => {
      val ser = seriesDf(s, d)
      MetricOps.backpressureRule(
        latency = ser.filter(col("sid") === "click").drop("sid"),
        consLag = ser.filter(col("sid") === "view").drop("sid"),
        bckPres = ser.filter(col("sid") === "error").drop("sid"))
    }),

    "m11_forecast_slope" -> ((s, d) => MetricOps.forecastSlope(seriesDf(s, d))),

    "a3_trailing_avg" -> ((s, d) =>
      MetricOps.trailingAvg(TimeSeriesOps.dense(seriesDf(s, d), STEP), STEP, points = 120)),

    "a4_promql_sum" -> ((s, d) => MetricOps.promSum(seriesDf(s, d))),
    // daily-periodicity profile: per (series, hour-of-day) mean — the
    // seasonal-naive baseline and peak-hour capacity view
    "ts_seasonal_profile" -> ((s, d) =>
      MetricOps.seasonalProfile(seriesDf(s, d))),
    // ACF lags 1..24 of the click series — the order-search diagnostic
    "m1_acf" -> ((s, d) => MetricOps.acf(seriesDf(s, d), "click")),
    // STL-style seasonality strength per series: 1 - Var(resid)/Var(raw)
    "ts_seasonal_strength" -> ((s, d) =>
      MetricOps.seasonalStrength(seriesDf(s, d))),

    "a5_promql_mean" -> ((s, d) => MetricOps.promMean(seriesDf(s, d))),

    "a6_quantile_p95" -> ((s, d) => MetricOps.quantileP95(seriesDf(s, d))),

    // Predictions-table parity (reference managers/DataManager.java:
    // 218-242 — one recorded decision row per evaluation tick): simulate
    // three ticks over growing prefixes of the metric history, append
    // each tick's M10 decision row to the durable store (exactly what
    // OptimizeLoop.attach does per tick), read the store back.
    "predictions_roundtrip" -> ((s, d) => {
      import org.apache.hadoop.fs.{FileSystem, Path}
      val path = s"target/graft-tmp/decisions_${new java.io.File(d).getName}"
      FileSystem.get(s.sparkContext.hadoopConfiguration).delete(new Path(path), true)
      // the bounds probe + 3 ticks x 3 per-sid legs all re-derive the
      // series subplan (9+ executions without a cache — measured 5.7 s vs
      // 2.9 s at sf0.1); scope-registered so the caller releases it
      val ser = graft.CacheScope.persist(seriesDf(s, d))
      val b = ser.agg(min("ts"), max("ts")).head
      val (t0, t1) = (b.getLong(0), b.getLong(1))
      (1 to 3).foreach { i =>
        val cut = t0 + (t1 - t0) * i / 3
        val pre = ser.filter(col("ts") <= cut)
        ProfilesStore.append(
          MetricOps.backpressureRule(
            pre.filter(col("sid") === "click").drop("sid"),
            pre.filter(col("sid") === "view").drop("sid"),
            pre.filter(col("sid") === "error").drop("sid"))
            .withColumn("tick", lit(i.toLong))
            .withColumn("cut_ts", lit(cut)),
          path)
      }
      ProfilesStore.read(s, path)
    }))

  def oracles: Map[String, String] = Map(
    // same quantization (exact ×10⁴ longs), DECIMAL(38,0) moments, and
    // the one-final-double-cast Pearson as the Spark side
    "ts_similarity_search" ->
      s"""WITH series AS ($SER),
         |sv AS (SELECT sid, ts,
         |    CAST(CAST(value AS DECIMAL(15,4)) * 10000 AS BIGINT) AS vi
         |  FROM series WHERE value IS NOT NULL),
         |posed AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY sid ORDER BY ts) AS BIGINT) AS pos FROM sv),
         |nq AS (SELECT MAX(pos) AS nn FROM posed WHERE sid = 'click'),
         |qry AS (SELECT pos - ((SELECT nn FROM nq) - 24) - 1 AS o, vi AS qv
         |  FROM posed WHERE sid = 'click' AND pos > (SELECT nn FROM nq) - 24),
         |qm AS (SELECT SUM(CAST(qv AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(qv AS DECIMAL(19,0)) * CAST(qv AS DECIMAL(19,0))) AS syy
         |  FROM qry),
         |ex AS (SELECT p.sid, p.pos - q.o AS start, p.ts, p.vi, q.qv
         |  FROM posed p, qry q WHERE p.pos - q.o >= 1),
         |wm AS (SELECT sid, start, COUNT(*) AS n, MIN(ts) AS ts0, MAX(ts) AS ts1,
         |    SUM(CAST(vi AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(vi AS DECIMAL(19,0)) * CAST(vi AS DECIMAL(19,0))) AS sxx,
         |    SUM(CAST(vi AS DECIMAL(19,0)) * CAST(qv AS DECIMAL(19,0))) AS sxy
         |  FROM ex GROUP BY sid, start),
         |ok AS (SELECT wm.*, qm.sy, qm.syy FROM wm, qm
         |  WHERE n = 24 AND ts1 - ts0 = 23 * 3600
         |    AND NOT (sid = 'click' AND start = (SELECT nn FROM nq) - 23)),
         |sc AS (SELECT sid, start, ts0,
         |    24 * sxx - sx * sx AS d1, 24 * syy - sy * sy AS d2,
         |    24 * sxy - sx * sy AS num
         |  FROM ok)
         |SELECT sid, CAST(start AS BIGINT) AS start_pos, ts0 AS start_ts,
         |  ROUND(CAST(num AS DOUBLE) /
         |    sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) + 1e-9, 6) AS corr
         |FROM sc WHERE d1 > 0 AND d2 > 0
         |ORDER BY corr DESC, sid, start LIMIT 10""".stripMargin,

    "m7_slope_intercept" ->
      s"""WITH series AS ($SER),
         |c AS (SELECT sid, ts - MIN(ts) OVER (PARTITION BY sid) AS x,
         |        value AS y FROM series WHERE value IS NOT NULL),
         |f AS (${fitSumsSql("c", "sid")}),
         |l AS (SELECT *, $slopeSql AS slope FROM f)
         |SELECT sid, n, ROUND(slope + 1e-9, 6) AS slope,
         |  ROUND((sy - slope*sx)/n + 1e-9, 4) AS intercept
         |FROM l""".stripMargin,

    "m8_validity_regression" ->
      s"""WITH profiles AS ($PRO),
         |r AS (SELECT scaleout, avglat AS value, expid,
         |        row_number() OVER (PARTITION BY scaleout
         |          ORDER BY stopts DESC, expid DESC) AS rn,
         |        stopts - MIN(stopts) OVER (PARTITION BY scaleout) AS x
         |      FROM profiles),
         |lastr AS (SELECT scaleout, x AS x_last, value AS last_value
         |          FROM r WHERE rn = 1),
         |train AS (SELECT scaleout, x, value AS y FROM r WHERE rn > 1),
         |f AS (${fitSumsSql("train", "scaleout")}),
         |l AS (SELECT *, $slopeSql AS slope FROM f),
         |p AS (SELECT l.scaleout, n AS n_train, last_value,
         |        (sy - slope*sx)/n + slope * x_last AS pred
         |      FROM l JOIN lastr ON l.scaleout = lastr.scaleout)
         |SELECT scaleout, n_train, last_value,
         |  ROUND(pred + 1e-9, 4) AS pred,
         |  abs((last_value - pred) / NULLIF(pred, 0e0)) < 2.0 AS valid
         |FROM p""".stripMargin,

    "m10_backpressure_rule" ->
      s"""WITH series AS ($SER),
         |per AS (SELECT CAST(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END)
         |          AS DOUBLE) / COUNT(*) AS bck_pres_per
         |        FROM series WHERE sid = 'error'),
         |lc AS (SELECT sid, ts - MIN(ts) OVER (PARTITION BY sid) AS x,
         |         value AS y FROM series
         |       WHERE value IS NOT NULL AND sid IN ('click', 'view')),
         |f AS (${fitSumsSql("lc", "sid")}),
         |sl AS (SELECT sid, $slopeSql AS slope FROM f),
         |j AS (SELECT bck_pres_per AS per_raw,
         |        (SELECT slope FROM sl WHERE sid = 'click') AS lat_raw,
         |        (SELECT slope FROM sl WHERE sid = 'view') AS lag_raw
         |      FROM per)
         |SELECT ROUND(per_raw + 1e-9, 4) AS bck_pres_per,
         |  ROUND(lat_raw + 1e-9, 6) AS latency_slope,
         |  ROUND(lag_raw + 1e-9, 6) AS conslag_slope,
         |  (per_raw = 1.0) OR (per_raw > 0.0
         |    AND lat_raw > 1.0 AND lag_raw > 1.0) AS is_bck_pres
         |FROM j""".stripMargin,

    "m11_forecast_slope" ->
      s"""WITH series AS ($SER),
         |b AS (SELECT sid, MIN(ts) AS t0, MAX(ts) AS t1 FROM series
         |      WHERE value IS NOT NULL GROUP BY sid),
         |s2 AS (SELECT s.sid, s.ts, s.value FROM series s JOIN b USING (sid)
         |       WHERE s.value IS NOT NULL AND s.ts >= (t0 + t1) / 2),
         |c AS (SELECT sid, ts - MIN(ts) OVER (PARTITION BY sid) AS x,
         |        value AS y FROM s2),
         |f AS (${fitSumsSql("c", "sid")})
         |SELECT sid, n, ROUND($slopeSql + 1e-9, 6) AS slope FROM f""".stripMargin,

    "a3_trailing_avg" ->
      s"""WITH series AS ($SER),
         |b AS (SELECT sid, MIN(ts) AS t0, MAX(ts) AS t1 FROM series GROUP BY 1),
         |g AS (SELECT sid, UNNEST(range(t0, t1 + $STEP, $STEP)) AS ts FROM b),
         |d AS (SELECT g.sid, g.ts, s.value FROM g LEFT JOIN series s USING (sid, ts)),
         |w AS (SELECT sid, ts, value,
         |        MAX(ts) OVER (PARTITION BY sid) - ${120L * STEP} AS w0 FROM d)
         |SELECT sid, MIN(w0) AS window_start,
         |  ROUND(${Sql.decSumSql("value")} / COUNT(value) + 1e-9, 4) AS avg_value,
         |  COUNT(value) AS n_obs
         |FROM w WHERE ts >= w0 GROUP BY sid""".stripMargin,

    "a4_promql_sum" ->
      s"""WITH series AS ($SER)
         |SELECT ts, ROUND(${Sql.decSumSql("value")}, 4) AS value
         |FROM series WHERE value IS NOT NULL GROUP BY ts""".stripMargin,

    "ts_seasonal_profile" ->
      s"""WITH series AS ($SER)
         |SELECT sid, (ts // 3600) % 24 AS hod, COUNT(value) AS n,
         |  ROUND(${Sql.decSumSql("value")} / COUNT(value) + 1e-9, 4) AS mean_value
         |FROM series GROUP BY 1, 2""".stripMargin,

    "ts_seasonal_strength" ->
      s"""WITH series AS ($SER),
         |p AS (SELECT sid, (ts // 3600) % 24 AS hod,
         |    ROUND(${Sql.decSumSql("value")} / COUNT(value) + 1e-9, 4) AS mean_value
         |  FROM series GROUP BY 1, 2),
         |j AS (SELECT s.sid, s.value, s.value - p.mean_value AS r
         |  FROM (SELECT sid, (ts // 3600) % 24 AS hod, value FROM series) s
         |  JOIN p ON s.sid = p.sid AND s.hod = p.hod),
         |ag AS (SELECT sid, COUNT(value) AS n,
         |    ${Sql.decSumSql("value")} AS sv, ${Sql.decSumSql("value * value")} AS sv2,
         |    ${Sql.decSumSql("r")} AS sr, ${Sql.decSumSql("r * r")} AS sr2
         |  FROM j GROUP BY sid),
         |v AS (SELECT sid, n,
         |    sv2 / n - (sv / n) * (sv / n) AS var_raw,
         |    sr2 / n - (sr / n) * (sr / n) AS var_resid FROM ag)
         |SELECT sid, n, ROUND(var_raw + 1e-9, 4) AS var_raw,
         |  ROUND(var_resid + 1e-9, 4) AS var_resid,
         |  CASE WHEN var_raw > 0
         |    THEN ROUND(1.0 - var_resid / var_raw + 1e-9, 6) END
         |    AS seasonal_strength
         |FROM v""".stripMargin,

    "m1_acf" ->
      s"""WITH series AS ($SER),
         |s AS MATERIALIZED (SELECT ts, value FROM series WHERE sid = 'click'),
         |st AS MATERIALIZED (SELECT ${Sql.decAvgSql("value")} AS mu FROM s),
         |c AS MATERIALIZED (SELECT ts, value - (SELECT mu FROM st) AS c FROM s),
         |den AS MATERIALIZED (SELECT ${Sql.decSumSql("c * c")} AS den FROM c),
         |ks AS (SELECT UNNEST(range(1, 25)) AS k),
         |pr AS (SELECT k, a.c AS ca, b.c AS cb
         |  FROM ks CROSS JOIN c a JOIN c b ON b.ts = a.ts + k * 3600),
         |num AS (SELECT k, ${Sql.decSumSql("ca * cb")} AS num FROM pr GROUP BY k)
         |SELECT CAST(k AS BIGINT) AS k,
         |  ROUND(num / (SELECT den FROM den) + 1e-9, 6) AS acf
         |FROM num WHERE (SELECT den FROM den) > 0""".stripMargin,

    "a5_promql_mean" ->
      s"""WITH series AS ($SER)
         |SELECT ts, ROUND(${Sql.decSumSql("value")} / COUNT(value) + 1e-9, 4) AS value
         |FROM series WHERE value IS NOT NULL GROUP BY ts""".stripMargin,

    "a6_quantile_p95" ->
      s"""WITH series AS ($SER),
         |r AS (SELECT sid, value,
         |        row_number() OVER (PARTITION BY sid ORDER BY value, ts) AS rn,
         |        COUNT(*) OVER (PARTITION BY sid) AS n
         |      FROM series WHERE value IS NOT NULL)
         |SELECT sid, n, value AS p95 FROM r
         |WHERE rn = (19*n + 19) // 20""".stripMargin,

    // three prefix ticks of the m10 decision, one row per tick
    "predictions_roundtrip" -> (1 to 3).map { i =>
      s"""SELECT * FROM (
         |WITH series AS ($SER),
         |cutc AS (SELECT MIN(ts) + ((MAX(ts) - MIN(ts)) * $i) // 3 AS cut FROM series),
         |pre AS (SELECT s.* FROM series s CROSS JOIN cutc WHERE s.ts <= cut),
         |per AS (SELECT CAST(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END)
         |          AS DOUBLE) / COUNT(*) AS bck_pres_per
         |        FROM pre WHERE sid = 'error'),
         |lc AS (SELECT sid, ts - MIN(ts) OVER (PARTITION BY sid) AS x,
         |         value AS y FROM pre
         |       WHERE value IS NOT NULL AND sid IN ('click', 'view')),
         |f AS (${fitSumsSql("lc", "sid")}),
         |sl AS (SELECT sid, $slopeSql AS slope FROM f),
         |j AS (SELECT bck_pres_per AS per_raw,
         |        (SELECT slope FROM sl WHERE sid = 'click') AS lat_raw,
         |        (SELECT slope FROM sl WHERE sid = 'view') AS lag_raw
         |      FROM per)
         |SELECT ROUND(per_raw + 1e-9, 4) AS bck_pres_per,
         |  ROUND(lat_raw + 1e-9, 6) AS latency_slope,
         |  ROUND(lag_raw + 1e-9, 6) AS conslag_slope,
         |  (per_raw = 1.0) OR (per_raw > 0.0
         |    AND lat_raw > 1.0 AND lag_raw > 1.0) AS is_bck_pres,
         |  CAST($i AS BIGINT) AS tick,
         |  (SELECT cut FROM cutc) AS cut_ts
         |FROM j)""".stripMargin
    }.mkString("\nUNION ALL\n"))
}
