package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M1 order selection — the auto-ARIMA analogue of the reference's
  * per-member `pm.auto_arima(..., out_of_sample_size=20%, scoring='mae')`
  * fit (reference analytics/app/workload/models.py:85-88), re-expressed
  * as ONE verifiable DataFrame plan.
  *
  * Per stride-ensemble member (the same end-anchored stride grids as
  * [[ArEnsemble.fitForecast]]), every (p, d, q) in the grid p ≤ 3,
  * d ≤ 1, q ≤ 1 is fitted by conditional least squares on the first
  * ~80% of the member's series and scored by one-step-ahead MAE on the
  * held-out last ~20% — the reference's own selection criterion (the
  * verdict's AIC works too; holdout MAE is chosen because it is
  * RATIONAL arithmetic end-to-end, so selection is bit-deterministic
  * across engines, where ln()'s last-ulp libm differences could flip a
  * near-tie). The winner (ties → smaller d, then p, then q) is refitted
  * on the full series and forecast `horizon` steps.
  *
  * Estimation is Hannan–Rissanen: MA terms need innovations, so a long
  * AR(4)-with-intercept first stage (exact 5×5 Cramer over decimal
  * moments) produces residuals, and the final regression of z on
  * [1, z lags, lagged residual] is again closed-form OLS — every system
  * up to 5×5 solved by generated cofactor-expansion Cramer expressions.
  * d = 1 members fit on the DIFFERENCED series and integrate forecasts
  * back from the last level — the piece a fixed AR(2) cannot express on
  * a trending workload.
  *
  * Exactness contract (the repo's standard recipe): all moment sums are
  * decimal (exact, order-free); every double expression — Cramer
  * determinants, residuals, predictions, forecast recursion — is ONE
  * generated SQL string evaluated by Spark `expr()` and pasted verbatim
  * into the DuckDB oracle, so both engines execute the identical IEEE
  * op sequence. Residuals and holdout deviations are rounded to 6
  * decimals before decimal-summing (the dsir_weights precedent).
  *
  * Scale shape: the member × d × config explosion is a bounded constant
  * (20 × 2 × 6) over a vocabulary... series-sized frame; fits are
  * partial-aggregated groupBys; the only windows partition by
  * (model_id[, d]) — the same bounded-series contract as
  * [[ArEnsemble.posed]]. Nothing driver-side except the plan itself.
  */
object AutoOrder {

  /** (p, q) arities in the grid; d is orthogonal. */
  private val pqGrid: Seq[(Int, Int)] =
    Seq((1, 0), (2, 0), (3, 0), (1, 1), (2, 1), (3, 1))

  /** Cofactor expansion along the first row — emits a parenthesized SQL
    * string; shared verbatim by both engines so the IEEE op order is
    * identical. */
  private def det(m: Vector[Vector[String]]): String =
    if (m.size == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(r =>
        r.indices.collect { case c if c != j => r(c) }.toVector)
      val t = s"${m(0)(j)} * (${det(minor)})"
      if (j % 2 == 0) t else s"(0e0 - $t)"
    }.mkString(" + ")

  private def mname(a: Int, b: Int) = s"m${a min b}${a max b}"

  /** Cramer pieces for the normal system restricted to regressor indexes
    * `vars`: (denominator det, numerator det per var). Moment columns
    * are named `pre`+m{ab} / `pre`+v{a}. */
  private def cramer(vars: Seq[Int], pre: String): (String, Seq[String]) = {
    val n = vars.size
    val m = Vector.tabulate(n, n)((i, j) => pre + mname(vars(i), vars(j)))
    val den = det(m)
    val nums = vars.indices.map { i =>
      det(Vector.tabulate(n, n)((r, c) =>
        if (c == i) s"${pre}v${vars(r)}" else pre + mname(vars(r), vars(c))))
    }
    (den, nums)
  }

  // ------------------------------------------------- shared SQL pieces --

  /** Decimal spelling per regressor index: z-lags carry the series'
    * 4-decimal grain; residuals were rounded to 6. */
  private def decOf(i: Int, e: String): String =
    if (i == 4) s"CAST($e AS DECIMAL(18,6))" else s"CAST($e AS DECIMAL(15,4))"
  private def decZ(e: String): String = s"CAST($e AS DECIMAL(15,4))"

  /** Moment aggregation SQL (alias = name) for regressors `reg` over rhs
    * z; emitted identically into the Spark agg and the oracle GROUP BY. */
  private def momentAggSqls(pre: String, reg: Int => String,
                            hi: Int): Seq[String] = {
    val ms = for (a <- 0 to hi; b <- a to hi) yield {
      val name = pre + mname(a, b)
      if (a == 0 && b == 0) s"CAST(COUNT(*) AS DOUBLE) AS $name"
      else if (a == 0) s"CAST(SUM(${decOf(b, reg(b))}) AS DOUBLE) AS $name"
      else s"CAST(SUM(${decOf(a, reg(a))} * ${decOf(b, reg(b))}) AS DOUBLE) AS $name"
    }
    val vs = for (a <- 0 to hi) yield {
      val name = s"${pre}v$a"
      if (a == 0) s"CAST(SUM(${decZ("z")}) AS DOUBLE) AS $name"
      else s"CAST(SUM(${decOf(a, reg(a))} * ${decZ("z")}) AS DOUBLE) AS $name"
    }
    ms ++ vs
  }

  /** Long-AR regressors (Hannan–Rissanen stage 1): the four z lags. */
  private val longReg: Int => String = i => s"z$i"
  /** Final-regression regressors: z lags 1..3 plus the lagged residual. */
  private val cfgReg: Int => String = i => if (i == 4) "e1" else s"z$i"

  private[graft] val longMomentSqls = momentAggSqls("g", longReg, 4)
  private[graft] val cfgMomentSqls = momentAggSqls("", cfgReg, 4)

  private val (gden, gnums) = cramer(0 to 4, "g")
  private[graft] val gdenSql = gden
  private[graft] def gcSql(i: Int): String =
    s"(${gnums(i)}) / NULLIF(gden, 0e0)"

  /** Config-dispatched Cramer: one CASE arm per (p, q) arity. */
  private[graft] val denDispatchSql: String =
    "CASE " + pqGrid.map { case (p, q) =>
      val vars = (0 to p) ++ (if (q == 1) Seq(4) else Nil)
      s"WHEN p = $p AND q = $q THEN (${cramer(vars, "")._1})"
    }.mkString(" ") + " END"

  private[graft] def coefDispatchSql(vi: Int): String = {
    val arms = pqGrid.flatMap { case (p, q) =>
      val vars = (0 to p) ++ (if (q == 1) Seq(4) else Nil)
      val idx = vars.indexOf(vi)
      if (idx < 0) None
      else Some(s"WHEN p = $p AND q = $q THEN (${cramer(vars, "")._2(idx)}) / NULLIF(den, 0e0)")
    }
    if (arms.isEmpty) "CAST(NULL AS DOUBLE)"
    else "CASE " + arms.mkString(" ") + " END"
  }

  /** Stage-1 residual: defined from the 4th row on, rounded to 6 so the
    * decimal moment sums stay exact and order-free. */
  private[graft] val residSql =
    "CASE WHEN u >= 4 THEN ROUND(z - (gc0 + gc1*z1 + gc2*z2 + gc3*z3 + gc4*z4), 6) END"

  /** One-step prediction under the row's (p, q) config. */
  private[graft] val predSql =
    "b0 + b1*z1 + CASE WHEN p >= 2 THEN b2*z2 ELSE 0e0 END" +
      " + CASE WHEN p >= 3 THEN b3*z3 ELSE 0e0 END" +
      " + CASE WHEN q = 1 THEN b4*e1 ELSE 0e0 END"
  private[graft] val adSql = s"ROUND(ABS(z - ($predSql)), 6)"
  private[graft] val maeSql = "CAST(sad AS DOUBLE) / nad"

  /** First rows a config can fit/score: z lags need u ≥ p; the MA term
    * needs the stage-1 residual lag, defined from u ≥ 5. */
  private[graft] val strtSql = "CASE WHEN q = 1 THEN GREATEST(p, 5) ELSE p END"

  /** Recursive forecast step k in z-space (MA innovation only at k=1,
    * future innovations are 0 by definition). */
  private[graft] def zfStepSql(k: Int): String = {
    def lag(i: Int): String = { val j = k - i; if (j >= 1) s"zf$j" else s"zl${1 - j}" }
    val ma = if (k == 1) " + CASE WHEN q = 1 THEN b4*el ELSE 0e0 END" else ""
    s"b0 + b1*${lag(1)} + CASE WHEN p >= 2 THEN b2*${lag(2)} ELSE 0e0 END" +
      s" + CASE WHEN p >= 3 THEN b3*${lag(3)} ELSE 0e0 END$ma"
  }

  /** y-space forecast k: d = 1 integrates the z forecasts back from the
    * last observed level. */
  private[graft] def fSql(k: Int): String =
    s"CASE WHEN d = 1 THEN ylast + (${(1 to k).map(i => s"zf$i").mkString(" + ")}) ELSE zf$k END"

  // ---------------------------------------------------------- Spark side --

  /** The full select-and-forecast plan over a single (ts, value) series.
    * Output per member with ≥ 1 fittable config: (model_id, p, d, q,
    * n_fit, mae, f1..f`horizon`).
    *
    * Optimization note (r18, guide §3.3/§7.3): the generated Cramer
    * dispatch expressions are ~10³-node trees and the fit frames are
    * reused by several consumers, so a lazily-cached spelling makes the
    * terminal action optimize ONE plan with 335 Exchange nodes — the
    * query was driver-bound (profiled 11.9 s wall / 8.0 s of driver gaps
    * / 4.1 s of task time at sf0.1). The bounded frames (≤ models·d·
    * configs rows) are now eagerly localCheckpointed, truncating lineage
    * so Catalyst plans each bounded stage once — identical rows, same
    * IEEE op sequence (checkpointing materializes the same computed
    * values; nothing is re-derived differently). */
  def selectAndForecast(series: DataFrame, models: Int = 20,
                        horizon: Int = 6): DataFrame = {
    val wM = Window.partitionBy("model_id")
    val strided = ArEnsemble.posed(series)
      .select(col("pos"), col("n"), col("value"),
        explode(sequence(lit(1), lit(models))).as("model_id"))
      .filter((col("n") - 1 - col("pos")) % col("model_id") === 0)
    val yf = strided
      .withColumn("t", row_number().over(wM.orderBy("pos")) - 1)
      .withColumn("ny", count(lit(1)).over(wM))
      .localCheckpoint()
    // z-series per d branch: d=0 is the member itself, d=1 its first
    // difference (re-indexed 0..m-1)
    val z0 = yf.select(col("model_id"), lit(0).as("d"), col("t").as("u"),
      col("value").as("z"), col("ny").as("m"))
    val z1 = yf
      .withColumn("zprev", lag(col("value"), 1).over(wM.orderBy("t")))
      .filter(col("t") >= 1)
      .select(col("model_id"), lit(1).as("d"), (col("t") - 1).as("u"),
        (col("value") - col("zprev")).as("z"), (col("ny") - 1).as("m"))
    val wD = Window.partitionBy("model_id", "d").orderBy("u")
    val zl = z0.unionByName(z1)
      .select(col("*"),
        lag(col("z"), 1).over(wD).as("z1"),
        lag(col("z"), 2).over(wD).as("z2"),
        lag(col("z"), 3).over(wD).as("z3"),
        lag(col("z"), 4).over(wD).as("z4"))
      .withColumn("cut", expr("m - (m + 4) div 5"))
      .localCheckpoint()
    // Hannan–Rissanen stage 1: AR(4)+intercept residuals, fitted on the
    // train window (selection) and the full window (final refit)
    def withResiduals(trainOnly: Boolean): DataFrame = {
      val rows = if (trainOnly) zl.filter(col("u") >= 4 && col("u") < col("cut"))
                 else zl.filter(col("u") >= 4)
      val aggs = longMomentSqls.map(expr)
      val lac = rows.groupBy(col("model_id"), col("d"))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("gden", expr(gdenSql))
      // one select for all five coefficients (a withColumn fold re-analyzes
      // the growing plan per column), then checkpoint: the Cramer trees
      // stay in ONE bounded 40-row stage instead of re-planning under
      // every downstream consumer
      val coefd = lac.select(col("*") +:
        (0 to 4).map(i => expr(gcSql(i)).as(s"gc$i")): _*)
      zl.join(coefd.select(col("model_id"), col("d"),
          col("gc0"), col("gc1"), col("gc2"), col("gc3"), col("gc4")),
          Seq("model_id", "d"))
        .withColumn("et", expr(residSql))
        .withColumn("e1", lag(col("et"), 1).over(wD))
        .localCheckpoint()
    }
    val zlT = withResiduals(trainOnly = true)
    val zlF = withResiduals(trainOnly = false)
    // the 6 (p, q) arities fan out as an exploded literal (map-side;
    // a 6-row crossJoin would plan a nested-loop join)
    val pqLit = typedlit(pqGrid)
    def withCfg(df: DataFrame): DataFrame = df
      .withColumn("pq", explode(pqLit))
      .withColumn("p", col("pq._1")).withColumn("q", col("pq._2"))
      .drop("pq")
      .withColumn("strt", expr(strtSql))
    def usable(dfc: DataFrame): DataFrame =
      dfc.filter(col("u") >= col("strt") &&
        (col("q") === 0 || col("e1").isNotNull))
    // single select per solve step (not a withColumn fold) and an eager
    // checkpoint: the ≤ 240-row solution frame carries the full CASE-
    // dispatched Cramer trees — bounding them to one planned stage
    def solve(mom: DataFrame): DataFrame = {
      val d1 = mom.withColumn("den", expr(denDispatchSql))
      d1.select(col("*") +:
          (0 to 4).map(i => expr(coefDispatchSql(i)).as(s"b$i")): _*)
        .localCheckpoint()
    }
    val cfgAggs = cfgMomentSqls.map(expr) :+ expr("COUNT(*) AS nf")
    val fitT = withCfg(zlT)
    val sol = solve(usable(fitT).filter(col("u") < col("cut"))
      .groupBy(col("model_id"), col("p"), col("d"), col("q"))
      .agg(cfgAggs.head, cfgAggs.tail: _*))
    // one-step-ahead holdout deviations → per-config MAE
    val maes = usable(fitT)
      .filter(col("u") >= col("cut"))
      .join(sol.select(col("model_id"), col("p"), col("d"), col("q"),
        col("b0"), col("b1"), col("b2"), col("b3"), col("b4")),
        Seq("model_id", "p", "d", "q"))
      .withColumn("ad", expr(adSql))
      .groupBy(col("model_id"), col("p"), col("d"), col("q"))
      .agg(expr("SUM(CAST(ad AS DECIMAL(25,6))) AS sad"),
        expr("COUNT(ad) AS nad"))
      .withColumn("mae", expr(maeSql))
      .localCheckpoint()
    val sel = maes.filter(col("mae").isNotNull)
      .withColumn("rk", row_number().over(
        wM.orderBy(col("mae"), col("d"), col("p"), col("q"))))
      .filter(col("rk") === 1)
      .select(col("model_id"), col("p"), col("d"), col("q"))
    // full refit of the chosen config only
    val fitF = usable(zlF
      .join(sel, Seq("model_id", "d"))
      .withColumn("strt", expr(strtSql)))
    val solF = solve(fitF
      .groupBy(col("model_id"), col("p"), col("d"), col("q"))
      .agg(cfgAggs.head, cfgAggs.tail: _*))
    // series end state: last z lags, last full-window residual, last level
    val endsZ = zlF.groupBy(col("model_id"), col("d")).agg(
      max(when(col("u") === col("m") - 1, col("z"))).as("zl1"),
      max(when(col("u") === col("m") - 2, col("z"))).as("zl2"),
      max(when(col("u") === col("m") - 3, col("z"))).as("zl3"),
      max(when(col("u") === col("m") - 1, col("et"))).as("el"))
    val endsY = yf.groupBy(col("model_id"))
      .agg(max(when(col("t") === col("ny") - 1, col("value"))).as("ylast"))
    val fc0 = solF
      .join(endsZ, Seq("model_id", "d"))
      .join(endsY, Seq("model_id"))
      .join(maes.select(col("model_id"), col("p"), col("d"), col("q"), col("mae")),
        Seq("model_id", "p", "d", "q"))
      .localCheckpoint()
    val fc = (1 to horizon).foldLeft(fc0)((df, k) =>
      df.withColumn(s"zf$k", expr(zfStepSql(k))))
    fc.select(Seq(col("model_id"),
      col("p").cast("long").as("p"), col("d").cast("long").as("d"),
      col("q").cast("long").as("q"), col("nf").as("n_fit"),
      round(col("mae") + lit(1e-9), 6).as("mae")) ++
      (1 to horizon).map(k =>
        round(expr(fSql(k)) + lit(1e-9), 4).as(s"f$k")): _*)
  }

  // --------------------------------------------------------- oracle side --

  /** DuckDB replay of [[selectAndForecast]] — expects a `wl(ts, value)`
    * CTE in scope (append after the workload CTEs). Every double
    * expression is the same generated string the Spark plan evaluates. */
  def oracleSql(models: Int = 20, horizon: Int = 6): String = {
    def longFit(name: String, where: String): String =
      s"""lam_$name AS MATERIALIZED (SELECT model_id, d,
         |    ${longMomentSqls.mkString(",\n    ")}
         |  FROM zl WHERE $where GROUP BY model_id, d),
         |lac_$name AS MATERIALIZED (SELECT *, $gdenSql AS gden FROM lam_$name),
         |lcc_$name AS MATERIALIZED (SELECT *,
         |    ${(0 to 4).map(i => s"${gcSql(i)} AS gc$i").mkString(",\n    ")}
         |  FROM lac_$name),
         |zl_$name AS MATERIALIZED (SELECT t.*, $residSql AS et,
         |    lag($residSql, 1) OVER (PARTITION BY t.model_id, t.d ORDER BY t.u) AS e1
         |  FROM (SELECT zl.*, gc0, gc1, gc2, gc3, gc4
         |        FROM zl JOIN lcc_$name USING (model_id, d)) t)""".stripMargin
    val zfChain = (1 to horizon).map(k =>
      s"zq$k AS MATERIALIZED (SELECT *, ${zfStepSql(k)} AS zf$k FROM zq${k - 1})")
      .mkString(",\n")
    s"""posed AS (SELECT value, row_number() OVER (ORDER BY ts) - 1 AS pos,
       |    COUNT(*) OVER () AS n FROM wl),
       |strided AS (SELECT m.model_id, pos, value
       |  FROM posed CROSS JOIN (SELECT UNNEST(range(1, ${models + 1})) AS model_id) m
       |  WHERE (n - 1 - pos) % m.model_id = 0),
       |yf AS MATERIALIZED (SELECT model_id, value,
       |    row_number() OVER (PARTITION BY model_id ORDER BY pos) - 1 AS t,
       |    COUNT(*) OVER (PARTITION BY model_id) AS ny
       |  FROM strided),
       |zf0 AS (SELECT model_id, 0 AS d, t AS u, value AS z, ny AS m FROM yf
       |  UNION ALL
       |  SELECT model_id, 1 AS d, t - 1 AS u, z, m FROM (
       |    SELECT model_id, t,
       |      value - lag(value) OVER (PARTITION BY model_id ORDER BY t) AS z,
       |      ny - 1 AS m
       |    FROM yf) WHERE t >= 1),
       |zl AS MATERIALIZED (SELECT *,
       |    lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2,
       |    lag(z, 3) OVER w AS z3, lag(z, 4) OVER w AS z4,
       |    m - (m + 4) // 5 AS cut
       |  FROM zf0 WINDOW w AS (PARTITION BY model_id, d ORDER BY u)),
       |${longFit("t", "u >= 4 AND u < cut")},
       |${longFit("f", "u >= 4")},
       |cfg AS (SELECT * FROM (VALUES ${pqGrid.map { case (p, q) => s"($p, $q)" }.mkString(", ")}) c(p, q)),
       |fitt AS MATERIALIZED (SELECT t.*, cfg.p, cfg.q, $strtSql AS strt
       |  FROM zl_t t CROSS JOIN cfg),
       |fm AS MATERIALIZED (SELECT model_id, p, d, q,
       |    ${cfgMomentSqls.mkString(",\n    ")},
       |    COUNT(*) AS nf
       |  FROM fitt
       |  WHERE u >= strt AND u < cut AND (q = 0 OR e1 IS NOT NULL)
       |  GROUP BY model_id, p, d, q),
       |sol0 AS MATERIALIZED (SELECT *, $denDispatchSql AS den FROM fm),
       |sol AS MATERIALIZED (SELECT *,
       |    ${(0 to 4).map(i => s"${coefDispatchSql(i)} AS b$i").mkString(",\n    ")}
       |  FROM sol0),
       |hp AS (SELECT f.model_id, f.p, f.d, f.q, $adSql AS ad
       |  FROM (SELECT * FROM fitt
       |        WHERE u >= cut AND u >= strt AND (q = 0 OR e1 IS NOT NULL)) f
       |  JOIN sol USING (model_id, p, d, q)),
       |maes AS MATERIALIZED (SELECT model_id, p, d, q,
       |    SUM(CAST(ad AS DECIMAL(25,6))) AS sad, COUNT(ad) AS nad
       |  FROM hp GROUP BY model_id, p, d, q),
       |maes2 AS MATERIALIZED (SELECT *, $maeSql AS mae FROM maes),
       |sel AS MATERIALIZED (SELECT model_id, p, d, q FROM (
       |    SELECT *, row_number() OVER (PARTITION BY model_id
       |      ORDER BY mae, d, p, q) AS rk
       |    FROM maes2 WHERE mae IS NOT NULL) WHERE rk = 1),
       |fitf AS (SELECT t.*, s.p, s.q, $strtSql AS strt
       |  FROM zl_f t JOIN sel s ON t.model_id = s.model_id AND t.d = s.d),
       |fmf AS MATERIALIZED (SELECT model_id, p, d, q,
       |    ${cfgMomentSqls.mkString(",\n    ")},
       |    COUNT(*) AS nf
       |  FROM fitf
       |  WHERE u >= strt AND (q = 0 OR e1 IS NOT NULL)
       |  GROUP BY model_id, p, d, q),
       |solf0 AS (SELECT *, $denDispatchSql AS den FROM fmf),
       |solf AS MATERIALIZED (SELECT *,
       |    ${(0 to 4).map(i => s"${coefDispatchSql(i)} AS b$i").mkString(",\n    ")}
       |  FROM solf0),
       |endz AS (SELECT model_id, d,
       |    MAX(CASE WHEN u = m - 1 THEN z END) AS zl1,
       |    MAX(CASE WHEN u = m - 2 THEN z END) AS zl2,
       |    MAX(CASE WHEN u = m - 3 THEN z END) AS zl3,
       |    MAX(CASE WHEN u = m - 1 THEN et END) AS el
       |  FROM zl_f GROUP BY model_id, d),
       |endy AS (SELECT model_id,
       |    MAX(CASE WHEN t = ny - 1 THEN value END) AS ylast
       |  FROM yf GROUP BY model_id),
       |zq0 AS MATERIALIZED (SELECT s.*, ez.zl1, ez.zl2, ez.zl3, ez.el, ey.ylast, m2.mae
       |  FROM solf s
       |  JOIN endz ez USING (model_id, d)
       |  JOIN endy ey USING (model_id)
       |  JOIN maes2 m2 USING (model_id, p, d, q)),
       |$zfChain
       |SELECT model_id, CAST(p AS BIGINT) AS p, CAST(d AS BIGINT) AS d,
       |  CAST(q AS BIGINT) AS q, CAST(nf AS BIGINT) AS n_fit,
       |  ROUND(mae + 1e-9, 6) AS mae,
       |  ${(1 to horizon).map(k => s"ROUND((${fSql(k)}) + 1e-9, 4) AS f$k").mkString(",\n  ")}
       |FROM zq$horizon""".stripMargin
  }
}
