package graft.queries

import graft.Tables
import graft.metrics.SmoothOps
import graft.timeseries.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verifiable queries for the smoothing/blending stages A8–A11. The SavGol
  * and exponential-window coefficient literals are generated ONCE on the
  * driver (12/15-decimal fixed point) and rendered into both the Spark
  * plan and the DuckDB oracle, so the convolutions are identical by
  * construction.
  */
object SmoothQueries extends QueryModule {

  private val SER = Tables.seriesSql
  private val STEP = 3600L

  private def seriesDf(s: SparkSession, d: String) = Tables.series(s, d)
  private def denseDf(s: SparkSession, d: String) =
    TimeSeriesOps.dense(seriesDf(s, d), STEP)
  /** Null-free 4-decimal input for SavGol (interpolate + renormalize). */
  private def interpDf(s: SparkSession, d: String) =
    TimeSeriesOps.interpolate(denseDf(s, d))
      .withColumn("value", round(col("value") + lit(1e-9), 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a8_savgol" -> ((s, d) => SmoothOps.savgol(interpDf(s, d))),
    "a9_exp_rolling_mean" -> ((s, d) =>
      SmoothOps.expRollingMean(denseDf(s, d), STEP)
        .withColumn("value", round(col("value") + lit(1e-9), 4))),
    "a10_ewm_blend" -> ((s, d) => SmoothOps.ewmBlend(denseDf(s, d))),
    "a11_centered_mean" -> ((s, d) => SmoothOps.centeredMean(denseDf(s, d))))

  // ------------------------------------------------------------ oracles --

  private val denseCte =
    s"""WITH series AS ($SER),
       |b AS (SELECT sid, MIN(ts) AS t0, MAX(ts) AS t1 FROM series GROUP BY 1),
       |g AS (SELECT sid, UNNEST(range(t0, t1 + $STEP, $STEP)) AS ts FROM b),
       |d AS (SELECT g.sid, g.ts, s.value FROM g LEFT JOIN series s USING (sid, ts))""".stripMargin

  /** Interpolation SQL over a relation `src(sid, ts, value)` → `value`. */
  private def interpSql(src: String) =
    s"""ii AS (SELECT sid, ts, value,
       |  last_value(value IGNORE NULLS) OVER wp AS pv,
       |  last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
       |  first_value(value IGNORE NULLS) OVER wn AS nv,
       |  first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
       |  FROM $src
       |  WINDOW wp AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wn AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |i AS (SELECT sid, ts, CASE WHEN value IS NOT NULL THEN value
       |  WHEN pv IS NULL THEN nv
       |  WHEN nv IS NULL THEN pv
       |  ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END AS value
       |FROM ii)""".stripMargin

  private def decList(vals: Seq[java.math.BigDecimal], typ: String) =
    vals.map(_.toPlainString).mkString("[", ", ", s"]::$typ[]")

  def oracles: Map[String, String] = Map(
    "a8_savgol" -> {
      val cInt = decList(SmoothOps.sgInterior, "DECIMAL(14,12)")
      val cHead = decList(SmoothOps.sgHead, "DECIMAL(14,12)")
      val cTail = decList(SmoothOps.sgTail, "DECIMAL(14,12)")
      s"""$denseCte,
         |${interpSql("d")},
         |i4 AS (SELECT sid, ts, ROUND(value + 1e-9, 4) AS value FROM i),
         |base AS (SELECT sid, ts, value,
         |    row_number() OVER (PARTITION BY sid ORDER BY ts) - 1 AS pos,
         |    COUNT(*) OVER (PARTITION BY sid) AS n
         |  FROM i4),
         |co AS (SELECT $cInt AS cint, $cHead AS chead, $cTail AS ctail),
         |intr AS (
         |  SELECT sid, pos - dd.d AS tpos,
         |    CAST(cint[dd.d + 26] AS DECIMAL(20,12)) * CAST(value AS DECIMAL(15,4)) AS contrib
         |  FROM base CROSS JOIN co
         |  CROSS JOIN (SELECT UNNEST(range(-25, 26)) AS d) dd
         |  WHERE pos - dd.d >= 25 AND pos - dd.d <= n - 26),
         |hd AS (
         |  SELECT sid, pp.p AS tpos,
         |    CAST(chead[pp.p * 51 + pos + 1] AS DECIMAL(20,12)) * CAST(value AS DECIMAL(15,4)) AS contrib
         |  FROM base CROSS JOIN co
         |  CROSS JOIN (SELECT UNNEST(range(0, 25)) AS p) pp
         |  WHERE pos < 51),
         |tl AS (
         |  SELECT sid, n - 25 + rr.r AS tpos,
         |    CAST(ctail[rr.r * 51 + (pos - (n - 51)) + 1] AS DECIMAL(20,12)) * CAST(value AS DECIMAL(15,4)) AS contrib
         |  FROM base CROSS JOIN co
         |  CROSS JOIN (SELECT UNNEST(range(0, 25)) AS r) rr
         |  WHERE pos >= n - 51),
         |summed AS (
         |  SELECT sid, tpos, SUM(contrib) AS sv
         |  FROM (SELECT * FROM intr UNION ALL SELECT * FROM hd
         |        UNION ALL SELECT * FROM tl)
         |  GROUP BY sid, tpos)
         |SELECT base.sid, ts, ROUND(CAST(sv AS DOUBLE) + 1e-9, 4) AS value
         |FROM base JOIN summed ON base.sid = summed.sid AND base.pos = summed.tpos""".stripMargin
    },

    "a9_exp_rolling_mean" -> {
      val wts = decList(SmoothOps.expWeights(), "DECIMAL(17,15)")
      s"""$denseCte,
         |co AS (SELECT $wts AS wexp),
         |contrib AS (
         |  SELECT sid, ts - dd.d * $STEP AS t_out,
         |    SUM(wexp[dd.d + 31] * CAST(value AS DECIMAL(15,4))) AS num,
         |    SUM(wexp[dd.d + 31]) AS den
         |  FROM d CROSS JOIN co
         |  CROSS JOIN (SELECT UNNEST(range(-30, 30)) AS d) dd
         |  WHERE value IS NOT NULL
         |  GROUP BY sid, ts - dd.d * $STEP),
         |m AS (SELECT d.sid, d.ts,
         |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS value
         |  FROM d LEFT JOIN contrib ON d.sid = contrib.sid AND d.ts = contrib.t_out),
         |${interpSql("m")}
         |SELECT sid, ts, ROUND(value + 1e-9, 4) AS value FROM i""".stripMargin
    },

    "a10_ewm_blend" -> {
      val lags = (1 to 20)
        .map(k => s"lag(value, $k) OVER w AS x$k").mkString(",\n    ")
      val chain = (2 to 20)
        .map(k => s"e$k AS (SELECT *, ${SmoothOps.ewmLevelSql(k)} AS acc$k FROM e${k - 1})")
        .mkString(",\n")
      s"""$denseCte,
         |e0 AS (SELECT sid, ts,
         |    $lags
         |  FROM d WINDOW w AS (PARTITION BY sid ORDER BY ts)),
         |e1 AS (SELECT *, x1 AS acc1 FROM e0),
         |$chain
         |SELECT sid, ts, ROUND(acc20 + 1e-9, 4) AS blend FROM e20""".stripMargin
    },

    "a11_centered_mean" ->
      s"""$denseCte
         |SELECT sid, ts,
         |  ROUND(CAST(SUM(CAST(value AS DECIMAL(15,4))) OVER fr AS DOUBLE)
         |    / COUNT(value) OVER fr + 1e-9, 4) AS value
         |FROM d
         |WINDOW fr AS (PARTITION BY sid ORDER BY ts
         |  ROWS BETWEEN 60 PRECEDING AND 59 FOLLOWING)""".stripMargin)
}
