package graft.queries

import graft.Tables
import graft.functions.SimpsonUdaf
import graft.metrics.AggOps
import graft.timeseries.TimeSeriesOps
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Verifiable queries for A7 (binned means), A15 (regression metrics) and
  * A12 (Simpson integration — both the relational weight-sum form and the
  * typed Aggregator UDAF, checked against the SAME oracle, which proves
  * the two implementations agree bit-for-bit).
  */
object AggQueries extends QueryModule {

  private val SER = Tables.seriesSql
  private val STEP = 3600L

  private def seriesDf(s: SparkSession, d: String) = Tables.series(s, d)

  /** Dense + interpolated + 4-decimal-renormalized series: Simpson input.
    * The round(+1e-9) pins interpolated midpoints (exact .xxxx5 halves)
    * to the same side on both engines, and makes every value an exact
    * DECIMAL(18,4) so the weighted sums are order-independent. */
  private def simpsonInput(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps.interpolate(TimeSeriesOps.dense(seriesDf(s, d), STEP))
      .withColumn("value", round(col("value") + lit(1e-9), 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a7_binned_means" -> ((s, d) => AggOps.binnedMeans(seriesDf(s, d), binCount = 10)),

    // y_pred = naive one-step (lag) forecast: a deterministic prediction
    // column to exercise the metric formulas.
    "a15_regression_metrics" -> ((s, d) => {
      val w = Window.partitionBy(col("sid")).orderBy(col("ts"))
      AggOps.regressionMetrics(
        seriesDf(s, d)
          .withColumn("y_pred", lag(col("value"), 1).over(w))
          .withColumnRenamed("value", "y_true"),
        Seq("sid"))
    }),

    "a12_simpson" -> ((s, d) => AggOps.simpsonIntegral(simpsonInput(s, d), STEP)),

    "a12_simpson_udaf" -> ((s, d) => {
      val integ = udaf(SimpsonUdaf,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      simpsonInput(s, d).groupBy(col("sid"))
        .agg(count(lit(1)).as("n"),
          round(integ(col("ts"), col("value")) + lit(1e-9), 4).as("integral"))
    }))

  /** Shared oracle CTE: dense grid + interpolation + 4-decimal renorm. */
  private val interpCte =
    s"""WITH series AS ($SER),
       |b AS (SELECT sid, MIN(ts) AS t0, MAX(ts) AS t1 FROM series GROUP BY 1),
       |g AS (SELECT sid, UNNEST(range(t0, t1 + $STEP, $STEP)) AS ts FROM b),
       |d AS (SELECT g.sid, g.ts, s.value FROM g LEFT JOIN series s USING (sid, ts)),
       |ii AS (SELECT sid, ts, value,
       |  last_value(value IGNORE NULLS) OVER wp AS pv,
       |  last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
       |  first_value(value IGNORE NULLS) OVER wn AS nv,
       |  first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
       |  FROM d
       |  WINDOW wp AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wn AS (PARTITION BY sid ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |i AS (SELECT sid, ts, ROUND(CASE WHEN value IS NOT NULL THEN value
       |  WHEN pv IS NULL THEN nv
       |  WHEN nv IS NULL THEN pv
       |  ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END + 1e-9, 4) AS value
       |FROM ii)""".stripMargin

  private val simpsonSelect =
    s"""r AS (SELECT sid, value,
       |        row_number() OVER (PARTITION BY sid ORDER BY ts) - 1 AS pos,
       |        COUNT(*) OVER (PARTITION BY sid) AS n
       |      FROM i),
       |w AS (SELECT sid, value, pos, n, n - (1 - n % 2) AS m FROM r),
       |w2 AS (SELECT sid, value, pos, n,
       |        CASE WHEN n < 2 THEN 0 WHEN m < 3 THEN 0
       |             WHEN pos >= m THEN 0
       |             WHEN pos = 0 OR pos = m - 1 THEN 1
       |             WHEN pos % 2 = 1 THEN 4 ELSE 2 END AS wgt
       |      FROM w)
       |SELECT sid, MAX(n) AS n,
       |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)) * wgt) AS DOUBLE) * $STEP / 3
       |    + CASE WHEN MAX(n) % 2 = 0 THEN
       |        CAST(MAX(CASE WHEN pos = n - 2 THEN CAST(value AS DECIMAL(18,4)) END)
       |           + MAX(CASE WHEN pos = n - 1 THEN CAST(value AS DECIMAL(18,4)) END)
       |          AS DOUBLE) * $STEP / 2
       |      ELSE 0 END + 1e-9, 4) AS integral
       |FROM w2 GROUP BY sid""".stripMargin

  def oracles: Map[String, String] = Map(
    "a7_binned_means" ->
      s"""WITH series AS ($SER),
         |r AS (SELECT sid, value,
         |        row_number() OVER (PARTITION BY sid ORDER BY ts) - 1 AS pos,
         |        COUNT(*) OVER (PARTITION BY sid) AS n
         |      FROM series WHERE value IS NOT NULL)
         |SELECT sid, (pos * 10) // n AS bin, COUNT(*) AS n_rows,
         |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
         |    + 1e-9, 4) AS mean_value
         |FROM r GROUP BY sid, (pos * 10) // n""".stripMargin,

    "a15_regression_metrics" ->
      s"""WITH series AS ($SER),
         |p AS (SELECT sid, value AS y_true,
         |        lag(value) OVER (PARTITION BY sid ORDER BY ts) AS y_pred
         |      FROM series),
         |e AS (SELECT sid, y_true,
         |        abs(CAST(CAST(y_true AS DECIMAL(18,4)) - CAST(y_pred AS DECIMAL(18,4))
         |            AS DECIMAL(15,4))) AS abs_e,
         |        CAST(CAST(y_true AS DECIMAL(18,4)) - CAST(y_pred AS DECIMAL(18,4))
         |            AS DECIMAL(15,4))
         |          * CAST(CAST(y_true AS DECIMAL(18,4)) - CAST(y_pred AS DECIMAL(18,4))
         |            AS DECIMAL(15,4)) AS sq_e,
         |        CASE WHEN y_true <> 0 THEN
         |          CAST(ROUND(CAST(abs(CAST(CAST(y_true AS DECIMAL(18,4))
         |              - CAST(y_pred AS DECIMAL(18,4)) AS DECIMAL(15,4))) AS DOUBLE)
         |            / abs(y_true), 8) AS DECIMAL(30,8)) END AS ape
         |      FROM p WHERE y_pred IS NOT NULL AND y_true IS NOT NULL),
         |sel AS (SELECT sid, abs_e,
         |          row_number() OVER (PARTITION BY sid ORDER BY abs_e, y_true) AS rn,
         |          COUNT(*) OVER (PARTITION BY sid) AS nn
         |        FROM e),
         |m AS (SELECT sid,
         |        (MIN(CAST(abs_e AS DOUBLE)) + MAX(CAST(abs_e AS DOUBLE))) / 2 AS medae
         |      FROM sel WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
         |      GROUP BY sid),
         |a AS (SELECT sid, COUNT(*) AS n,
         |        CAST(SUM(abs_e) AS DOUBLE) / COUNT(*) AS mae,
         |        CAST(SUM(ape) AS DOUBLE) / COUNT(ape) AS mape,
         |        CAST(SUM(sq_e) AS DOUBLE) / COUNT(*) AS mse
         |      FROM e GROUP BY sid)
         |SELECT a.sid, n, ROUND(mae + 1e-9, 6) AS mae,
         |  ROUND(medae + 1e-9, 6) AS medae, ROUND(mape + 1e-9, 6) AS mape,
         |  ROUND(mse + 1e-9, 6) AS mse, ROUND(sqrt(mse) + 1e-9, 6) AS rmse
         |FROM a JOIN m ON a.sid = m.sid""".stripMargin,

    "a12_simpson" -> s"$interpCte,\n$simpsonSelect",
    "a12_simpson_udaf" -> s"$interpCte,\n$simpsonSelect")
}
