package graft.queries

import graft.Tables
import graft.models.{CapacityModel, RecoveryOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The recovery-time vertical slice (SURVEY.md §7.2): M2 capacity ridge →
  * M5 Simpson catch-up loop → M12 candidate finalization, plus the
  * standalone M2 query. The oracle unrolls the (bounded) catch-up loop to
  * `ITERS` SQL layers — the Spark driver loop and the unrolled SQL share
  * every constant and expression shape, so results match bit-for-bit.
  */
object ModelQueries extends QueryModule {

  private val SER = Tables.seriesSql
  private val PRO = Tables.profilesSql
  private val STEP = 3600L
  private val WEEK = 604800L
  private val CHECKPOINT = 18000L
  private val DOWNTIME = 7200.0
  private val RATE_SCALE = 1000
  private val RESTRICTION = 31700.0
  private val CURRENT = 8
  private val ITERS = 12

  /** Past workload: the interpolated, 4-decimal-renormalized click series. */
  private def pastDf(s: SparkSession, d: String): DataFrame =
    Tables.clickWorkload(s, d)

  private def capacityTrain(s: SparkSession, d: String): DataFrame =
    Tables.profiles(s, d).filter(col("isbckpres") === 1)
      .select(col("scaleout"), col("avgthr").as("y"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m2_capacity" -> ((s, d) =>
      CapacityModel.predict(s, CapacityModel.fit(capacityTrain(s, d)), 2, 24)
        .select(col("scaleout"), round(col("capacity") + lit(1e-9), 4).as("capacity"),
          col("alpha"))),

    // S11 — model persistence: fit, save the coefficient row to parquet,
    // LOAD it back, predict from the loaded state. Same oracle as
    // m2_capacity — the round-trip must be value-exact.
    "s11_model_persistence" -> ((s, d) => {
      val path = s"target/graft-tmp/capmodel_${new java.io.File(d).getName}"
      CapacityModel.fit(capacityTrain(s, d)).write.mode("overwrite").parquet(path)
      CapacityModel.predict(s, s.read.parquet(path), 2, 24)
        .select(col("scaleout"), round(col("capacity") + lit(1e-9), 4).as("capacity"),
          col("alpha"))
    }),

    "m5_recovery_candidates" -> ((s, d) => {
      val past = pastDf(s, d)
      val anchor = past.agg(max("ts")).head.getLong(0)
      // deterministic "forecast": seasonal mirror of the final week
      val fut = past.filter(col("ts") > anchor - WEEK)
        .select((col("ts") + WEEK).as("ts"), col("value"))
      val total = past.unionByName(fut)
      val rate = CapacityModel.predict(s, CapacityModel.fit(capacityTrain(s, d)), 2, 24)
        .withColumn("capacity", col("capacity") / RATE_SCALE)
      val cands = RecoveryOps.catchUp(s, total, rate, anchor,
        STEP, CHECKPOINT, DOWNTIME, ITERS)
      RecoveryOps.finalize(cands, DOWNTIME, RESTRICTION, CURRENT)
        .select(col("scaleout"),
          round(col("capacity") + lit(1e-9), 4).as("rate"),
          round(col("catch_up") + lit(1e-9), 4).as("catch_up"),
          col("n_iters"),
          round(col("recovery_time") + lit(1e-9), 4).as("recovery_time"),
          col("is_valid"), col("is_best"), col("is_current"))
    }))

  // ------------------------------------------------------------ oracles --

  /** M2 fit CTEs (train → stats → per-alpha params → LOO scores → best). */
  private val fitCtes =
    s"""train AS MATERIALIZED (SELECT scaleout, avgthr AS y FROM profiles WHERE isbckpres = 1),
       |st AS (SELECT COUNT(*) AS n,
       |  CAST(SUM(scaleout) AS DOUBLE) AS sx,
       |  CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
       |  CAST(SUM(CAST(scaleout AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,4)))
       |    AS DOUBLE) AS sxy,
       |  CAST(SUM(CAST(scaleout*scaleout AS DECIMAL(38,0))) AS DOUBLE) AS sxx
       |FROM train),
       |par AS (SELECT alpha, n, sx/n AS xbar, sy/n AS ybar,
       |  sxx - sx*sx/n AS sxxc, sxy - sx*sy/n AS sxyc
       |  FROM (VALUES (1e-1), (1e0), (1e1)) a(alpha) CROSS JOIN st),
       |par2 AS (SELECT *, sxyc/(sxxc + alpha) AS slope FROM par),
       |par3 AS (SELECT *, ybar - slope*xbar AS intercept FROM par2),
       |sc AS (SELECT alpha, slope, intercept,
       |  CAST(SUM(loo) AS DOUBLE)/COUNT(*) AS score
       |  FROM (SELECT p.alpha, p.slope, p.intercept,
       |    CAST(ROUND((y - (intercept + slope*scaleout))
       |        / (1e0 - (1e0/n + (scaleout - xbar)*(scaleout - xbar)/(sxxc + alpha)))
       |      * ((y - (intercept + slope*scaleout))
       |        / (1e0 - (1e0/n + (scaleout - xbar)*(scaleout - xbar)/(sxxc + alpha))))
       |      + 1e-9, 4) AS DECIMAL(30,4)) AS loo
       |    FROM train CROSS JOIN par3 p)
       |  GROUP BY alpha, slope, intercept),
       |best AS MATERIALIZED (SELECT * FROM sc ORDER BY score, alpha LIMIT 1)""".stripMargin

  /** Interpolated click workload CTEs → wl(ts, value). */
  private val workloadCtes = Sql.clickWorkloadCtes

  /** One unrolled catch-up iteration: s{k-1} → s{k}. */
  private def iterCtes(k: Int): String = {
    val p = s"s${k - 1}"
    s"""sl$k AS MATERIALIZED (SELECT c.scaleout, w.value,
       |    row_number() OVER (PARTITION BY c.scaleout ORDER BY w.ts) - 1 AS pos,
       |    COUNT(*) OVER (PARTITION BY c.scaleout) AS n
       |  FROM $p c JOIN tot w ON c.active AND w.ts BETWEEN c.st AND c.en),
       |iw$k AS (SELECT *, CASE WHEN n < 2 THEN 0 WHEN m < 3 THEN 0
       |    WHEN pos >= m THEN 0 WHEN pos = 0 OR pos = m - 1 THEN 1
       |    WHEN pos % 2 = 1 THEN 4 ELSE 2 END AS wgt
       |  FROM (SELECT *, n - (1 - n % 2) AS m FROM sl$k)),
       |ig$k AS MATERIALIZED (SELECT scaleout, MAX(n) AS n_slice,
       |    CAST(SUM(CAST(value AS DECIMAL(15,4)) * wgt) AS DOUBLE) * $STEP / 3
       |    + CASE WHEN MAX(n) % 2 = 0 THEN
       |        CAST(MAX(CASE WHEN pos = n - 2 THEN CAST(value AS DECIMAL(15,4)) END)
       |           + MAX(CASE WHEN pos = n - 1 THEN CAST(value AS DECIMAL(15,4)) END)
       |          AS DOUBLE) * $STEP / 2
       |      ELSE 0 END AS integral
       |  FROM iw$k GROUP BY scaleout),
       |s$k AS MATERIALIZED (SELECT c.scaleout, c.capacity,
       |    CASE WHEN c.active AND i.n_slice IS NOT NULL THEN c.en ELSE c.st END AS st,
       |    CASE WHEN c.active AND i.n_slice IS NOT NULL
       |           AND i.integral / c.capacity >= 1e0
       |      THEN c.en + CAST(CEIL(i.integral / c.capacity) AS BIGINT)
       |      ELSE c.en END AS en,
       |    c.sum_tc + CASE WHEN c.active AND i.n_slice IS NOT NULL
       |      THEN i.integral / c.capacity ELSE 0e0 END AS sum_tc,
       |    c.iters + CASE WHEN c.active AND i.n_slice IS NOT NULL THEN 1 ELSE 0 END AS iters,
       |    c.active AND i.n_slice IS NOT NULL
       |      AND i.integral / c.capacity >= 1e0 AS active
       |  FROM $p c LEFT JOIN ig$k i USING (scaleout))""".stripMargin
  }

  private val m2Sql =
    s"""WITH profiles AS ($PRO),
       |$fitCtes
       |SELECT r.scaleout, ROUND(intercept + slope*r.scaleout + 1e-9, 4) AS capacity,
       |  alpha
       |FROM range(2, 25) r(scaleout) CROSS JOIN best""".stripMargin

  def oracles: Map[String, String] = Map(
    "m2_capacity" -> m2Sql,
    "s11_model_persistence" -> m2Sql,

    "m5_recovery_candidates" ->
      s"""WITH series AS ($SER),
         |profiles AS ($PRO),
         |$fitCtes,
         |$workloadCtes,
         |anch AS MATERIALIZED (SELECT MAX(ts) AS a FROM wl),
         |tot AS MATERIALIZED (SELECT ts, value FROM wl
         |        UNION ALL
         |        SELECT ts + $WEEK, value FROM wl
         |        WHERE ts > (SELECT a - $WEEK FROM anch)),
         |s0 AS MATERIALIZED (SELECT r.scaleout,
         |    (intercept + slope*r.scaleout) / $RATE_SCALE AS capacity,
         |    (SELECT a FROM anch) - $CHECKPOINT AS st,
         |    (SELECT a FROM anch) + CAST(CEIL(${DOWNTIME}e0) AS BIGINT) AS en,
         |    0e0 AS sum_tc, 0 AS iters, TRUE AS active
         |  FROM range(2, 25) r(scaleout) CROSS JOIN best),
         |${(1 to ITERS).map(iterCtes).mkString(",\n")},
         |fin AS (SELECT scaleout, capacity, sum_tc AS catch_up, iters AS n_iters,
         |    sum_tc + ${DOWNTIME}e0 AS recovery_time
         |  FROM s$ITERS),
         |v AS (SELECT *, recovery_time < ${RESTRICTION}e0 AS is_valid FROM fin)
         |SELECT scaleout, ROUND(capacity + 1e-9, 4) AS rate,
         |  ROUND(catch_up + 1e-9, 4) AS catch_up, n_iters,
         |  ROUND(recovery_time + 1e-9, 4) AS recovery_time, is_valid,
         |  is_valid AND COUNT(CASE WHEN is_valid THEN 1 END)
         |    OVER (ORDER BY scaleout ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND 1 PRECEDING) = 0 AS is_best,
         |  scaleout = $CURRENT AS is_current
         |FROM v""".stripMargin)
}
