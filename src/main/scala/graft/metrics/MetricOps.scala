package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The metric-query layer: PromQL-equivalent aggregations (A4/A5/A6),
  * trailing windows (A3), and the closed-form simple-regression family
  * (M7/M8/M10/M11) the reference serves via REST
  * (reference analytics/app/common/routes.py:27-47, closed-form predict
  * ClientsManager.java:441-450, validity Evaluate.java:41-56, backpressure
  * rule ClientsManager.java:329-339).
  *
  * FP discipline: OLS runs on the closed form slope = (n·Sxy − Sx·Sy) /
  * (n·Sxx − Sx²) where every sum is an exact DECIMAL aggregate of exact
  * inputs (x integer, y 4-decimal), cast to double only at the end. Both
  * engines then evaluate the same IEEE expression on identical doubles →
  * bit-identical slopes (covar_pop/var_pop would NOT be portable: Spark
  * and DuckDB use different streaming accumulation orders).
  *
  * Scale: everything is groupBy partial aggregation or a group-partitioned
  * window — no global windows, no driver loops.
  */
object MetricOps {

  /** Per-group exact OLS sums over columns `x` (integer, pre-centered) and
    * `y` (double with ≤4 decimals). Rows with null y must be pre-filtered.
    */
  def fitStats(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(col("y")).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y").cast(DecimalType(18, 4))).cast("double").as("sy"),
      sum(col("x").cast(DecimalType(18, 0)) * col("y").cast(DecimalType(18, 4)))
        .cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(DecimalType(38, 0))).cast("double").as("sxx"))

  /** Closed-form slope/intercept from [[fitStats]] sums (intercept at x=0,
    * i.e. at the centering origin — matching SimpleRegression fed with
    * ts − firstTs, reference Evaluate.java:50-53). A singular design
    * (n < 2, or all x equal — e.g. a one-point series at an optimize
    * tick) yields NULL slope/intercept, not an ANSI divide-by-zero that
    * would kill the caller's stream; the oracles' shared slope SQL
    * mirrors this with NULLIF on the denominator. */
  def withLine(stats: DataFrame): DataFrame = {
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    stats
      .withColumn("slope",
        when(den =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / den))
      .withColumn("intercept",
        when(col("n") > 0, (col("sy") - col("slope") * col("sx")) / col("n")))
  }

  /** M7 — per-series slope/intercept with x = ts − min(ts) per group.
    * Empty groupCols = one global series: the `ts % 1` partition key
    * (constant but not foldable) keeps the bounded-by-design single
    * partition from reading as an accidental global window. */
  def slopeIntercept(series: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val w =
      if (groupCols.isEmpty) Window.partitionBy(col("ts") % 1)
      else Window.partitionBy(groupCols.map(col): _*)
    val xy = series.filter(col("value").isNotNull)
      .withColumn("x", col("ts") - min(col("ts")).over(w))
      .withColumn("y", col("value"))
    withLine(fitStats(xy, groupCols))
      .select(groupCols.map(col) :+ col("n") :+
        round(col("slope") + lit(1e-9), 6).as("slope") :+
        round(col("intercept") + lit(1e-9), 4).as("intercept"): _*)
  }

  /** M11 — forecast slope: M7 restricted to the second half of each
    * series' time range (the "future workload" slice, reference
    * recoverytime/models.py:111-116). */
  def forecastSlope(series: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val sliced = series.filter(col("value").isNotNull)
      .withColumn("mid", (min(col("ts")).over(w) + max(col("ts")).over(w)) / 2)
      .filter(col("ts") >= col("mid"))
    val xy = sliced
      .withColumn("x", col("ts") - min(col("ts")).over(w))
      .withColumn("y", col("value"))
    withLine(fitStats(xy, groupCols))
      .select(groupCols.map(col) :+ col("n") :+
        round(col("slope") + lit(1e-9), 6).as("slope"): _*)
  }

  /** M8 — validity via regression, per candidate group: fit on all
    * observations but the last (ordered by ts, ties by `tieCol`), predict
    * the last, valid iff |(last − pred)/pred| < `distance`
    * (reference Evaluate.java:41-56). */
  def validityRegression(obs: DataFrame, groupCols: Seq[String],
                         tieCol: String, distance: Double = 2.0): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
    val ranked = obs
      .withColumn("rn", row_number().over(
        w.orderBy(col("ts").desc, col(tieCol).desc)))
      .withColumn("x", col("ts") - min(col("ts")).over(w))
    val lastRow = ranked.filter(col("rn") === 1)
      .select(g :+ col("x").as("x_last") :+ col("value").as("last_value"): _*)
    val train = ranked.filter(col("rn") > 1).withColumn("y", col("value"))
    withLine(fitStats(train, groupCols))
      .join(lastRow, groupCols)
      .withColumn("pred", col("intercept") + col("slope") * col("x_last"))
      // try_divide: a pred of exactly 0 yields NULL validity (oracle:
      // NULLIF denominator) instead of an ANSI divide-by-zero error
      .withColumn("valid",
        abs(try_divide(col("last_value") - col("pred"), col("pred"))) < distance)
      .select(g :+ col("n").as("n_train") :+ col("last_value") :+
        round(col("pred") + lit(1e-9), 4).as("pred") :+ col("valid"): _*)
  }

  /** A4 — PromQL `sum(metric)` across series per timestamp. */
  def promSum(series: DataFrame): DataFrame =
    series.filter(col("value").isNotNull).groupBy(col("ts"))
      .agg(round(sum(col("value").cast(DecimalType(30, 6))).cast("double"), 4).as("value"))

  /** A5 — PromQL `sum/count` (mean across series) per timestamp. */
  def promMean(series: DataFrame): DataFrame =
    series.filter(col("value").isNotNull).groupBy(col("ts"))
      .agg(round(sum(col("value").cast(DecimalType(30, 6))).cast("double") /
        count(col("value")) + lit(1e-9), 4).as("value"))

  /** A3 — trailing-window average per series: mean of the last `points`
    * grid steps (inclusive window [max_ts − points·step, max_ts], matching
    * the reference's getLat(now − avgWindow, now).avg(),
    * reference execution/phoebe/Graph.java:82-87). */
  def trailingAvg(dense: DataFrame, step: Long, points: Int,
                  groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
    dense
      .withColumn("w0", max(col("ts")).over(w) - lit(points.toLong * step))
      .filter(col("ts") >= col("w0"))
      .groupBy(g: _*)
      .agg(
        min(col("w0")).as("window_start"),
        round(sum(col("value").cast(DecimalType(30, 6))).cast("double") /
          count(col("value")) + lit(1e-9), 4).as("avg_value"),
        count(col("value")).as("n_obs"))
  }

  /** A6 — discrete p95 per series: the ⌈0.95·n⌉-th smallest non-null value
    * (value-then-ts ordering). Element selection, not interpolation, so the
    * result is an exact input value on both engines. */
  def quantileP95(series: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
    series.filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w.orderBy(col("value"), col("ts"))))
      .withColumn("n", count(lit(1)).over(w))
      // ceil(0.95n) = (19n+19) div 20, in exact integer arithmetic
      // (Column `/` is double division; `div` keeps this exact at any n)
      .filter(col("rn") === expr("(19 * n + 19) div 20"))
      .select(g :+ col("n") :+ col("value").as("p95"): _*)
  }

  /** M10 — backpressure rule: isBckPres ⇐ (per == 1) ∨ (0 < per ∧
    * slope(latency) > 1 ∧ slope(consLag) > 1)
    * (reference ClientsManager.java:329-339). `per` is the fraction of
    * grid points where the backpressure series is positive. */
  def backpressureRule(latency: DataFrame, consLag: DataFrame,
                       bckPres: DataFrame): DataFrame = {
    def slopeOf(df: DataFrame, name: String) =
      slopeIntercept(df, groupCols = Seq.empty).select(
        col("slope").as(s"${name}_slope"))
    val per = bckPres.agg(
      (sum(when(col("value") > 0, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("bck_pres_per"))
    per.crossJoin(slopeOf(latency, "latency"))
      .crossJoin(slopeOf(consLag, "conslag"))
      .withColumn("is_bck_pres",
        (col("bck_pres_per") === 1.0) ||
          (col("bck_pres_per") > 0.0 && col("latency_slope") > 1.0 &&
            col("conslag_slope") > 1.0))
      .select(round(col("bck_pres_per") + lit(1e-9), 4).as("bck_pres_per"),
        round(col("latency_slope") + lit(1e-9), 6).as("latency_slope"),
        round(col("conslag_slope") + lit(1e-9), 6).as("conslag_slope"),
        col("is_bck_pres"))
  }

  /** HOUR-OF-DAY SEASONAL PROFILE per series — the daily-periodicity
    * view of a workload (the reference's sine/tiled workloads are
    * built from exactly this structure): per (sid, hour-of-day), the
    * observation count and decimal-exact mean value. The profile is
    * what a seasonal-naive forecaster serves and what capacity
    * planning reads peak hours from. One partial-agg shuffle over
    * sid×24 groups. */
  def seasonalProfile(series: DataFrame): DataFrame =
    series.select(col("sid"),
        (expr("ts div 3600") % 24).as("hod"), col("value"))
      .groupBy(col("sid"), col("hod"))
      .agg(count(col("value")).as("n"),
        round(graft.queries.Sql.decAvg(col("value")) + lit(1e-9), 4)
          .as("mean_value"))

  /** SEASONALITY STRENGTH per series — the STL-style decision metric
    * for whether the hour-of-day structure is worth modeling:
    * 1 − Var(residual)/Var(raw), residual = value − its (sid, hod)
    * profile mean ([[seasonalProfile]]'s rounded means, so the
    * subtraction is deterministic on both engines). Variances ride the
    * per-product decimal rounding pattern; a zero-variance series
    * reports NULL strength rather than NaN. Output: (sid, n, var_raw,
    * var_resid, seasonal_strength). */
  def seasonalStrength(series: DataFrame): DataFrame = {
    val prof = seasonalProfile(series)
      .select(col("sid"), col("hod"), col("mean_value"))
    def dsum(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    series.select(col("sid"), (expr("ts div 3600") % 24).as("hod"), col("value"))
      .join(prof, Seq("sid", "hod"))
      .withColumn("r", col("value") - col("mean_value"))
      .groupBy(col("sid"))
      .agg(count(col("value")).as("n"),
        dsum(col("value")).as("sv"), dsum(col("value") * col("value")).as("sv2"),
        dsum(col("r")).as("sr"), dsum(col("r") * col("r")).as("sr2"))
      .withColumn("var_raw",
        col("sv2") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")))
      .withColumn("var_resid",
        col("sr2") / col("n") - (col("sr") / col("n")) * (col("sr") / col("n")))
      .select(col("sid"), col("n"),
        round(col("var_raw") + lit(1e-9), 4).as("var_raw"),
        round(col("var_resid") + lit(1e-9), 4).as("var_resid"),
        when(col("var_raw") > 0,
          round(lit(1.0) - col("var_resid") / col("var_raw") + lit(1e-9), 6))
          .as("seasonal_strength"))
  }

  /** AUTOCORRELATION FUNCTION of one series, lags 1..maxLag — the
    * diagnostic that justifies the forecaster's (p, q) order search
    * ([[graft.models.AutoOrder]]): r_k = Σ c_t·c_{t+k} / Σ c_t², with
    * c = value − mean. Exactness: the mean is the decimal-exact
    * average, every centered product is individually rounded to a
    * decimal before summing (the [[graft.queries.Sql.decSum]] pattern,
    * so partitioning can't reorder float adds), and lag pairing is an
    * equi-join on ts + k·step — the in-row lag explode is bounded ×
    * maxLag, never a window over the whole series. */
  def acf(series: DataFrame, sid: String, maxLag: Int = 24,
          step: Long = 3600L): DataFrame = {
    val s = graft.CacheScope.persist(
      series.filter(col("sid") === sid).select(col("ts"), col("value")))
    val stats = s.agg(graft.queries.Sql.decAvg(col("value")).as("mu"))
    val c = graft.CacheScope.persist(
      s.crossJoin(broadcast(stats))
        .select(col("ts"), (col("value") - col("mu")).as("c")))
    val den = c.agg(
      sum((col("c") * col("c")).cast(DecimalType(30, 6))).cast("double").as("den"))
    val ks = typedlit((1 to maxLag).map(_.toLong))
    c.select(col("ts"), col("c"), explode(ks).as("k"))
      .withColumn("ts2", col("ts") + col("k") * step)
      .join(c.select(col("ts").as("ts2"), col("c").as("c2")), Seq("ts2"))
      .groupBy(col("k"))
      .agg(sum((col("c") * col("c2")).cast(DecimalType(30, 6)))
        .cast("double").as("num"))
      .crossJoin(broadcast(den))
      // a zero-variance (constant) series has no autocorrelation to
      // report: skip instead of emitting 24 NaN rows (the
      // anomalyWindows zero-variance convention)
      .filter(col("den") > 0)
      .select(col("k"),
        round(col("num") / col("den") + lit(1e-9), 6).as("acf"))
  }

  /** TIME-SERIES SIMILARITY SEARCH (the UCR-suite / Matrix-Profile
    * family's bread-and-butter query, and the capability of the EDBT'19
    * "Time Series Similarity Search for Streaming Data in Distributed
    * Systems" line of work): given a query pattern — here the LAST
    * `win` points of series `querySid` — rank every contiguous
    * `win`-point window of every series by z-normalized similarity
    * (Pearson correlation: scale/offset-invariant, so a series 10× the
    * magnitude with the same shape still matches).
    *
    * FP discipline (the [[fitStats]] recipe, one level up): values are
    * quantized EXACTLY (×10⁴ of the 4-decimal source) to longs, every
    * moment is a DECIMAL(38,0) sum of DECIMAL-cast-then-multiplied
    * factors (a raw Long product would overflow past |value| ≈ 9.6e5,
    * inside what the quantization admits), and the Pearson
    * numerator/radicands stay in DECIMAL until ONE final
    * correctly-rounded double cast each (decimal→double is
    * correctly-rounded in both engines — verified) — so both engines
    * compare identical doubles. Zero-variance windows are skipped (the
    * acf convention); windows broken by missing hours fail the
    * n = win ∧ span = (win−1)·step contiguity check instead of matching
    * across a gap.
    *
    * Shape: one offset explode (×win) over the metric store, one
    * partial-agg groupBy (sid, start) — the window moments — against a
    * broadcast 1-row query-moment frame; top-k via TakeOrderedAndProject.
    * The per-sid row_number window partitions by series id, the metric
    * store's scale key. Output: (sid, start_pos, start_ts, corr). */
  def tsSimilaritySearch(series: DataFrame, querySid: String = "click",
                         win: Int = 24, step: Long = 3600L,
                         topK: Int = 10): DataFrame = {
    val sv = series.filter(col("value").isNotNull)
      .select(col("sid"), col("ts"),
        (col("value").cast(DecimalType(15, 4)) * 10000).cast("long").as("vi"))
    val posed = sv.withColumn("pos",
      row_number().over(Window.partitionBy(col("sid")).orderBy(col("ts"))).cast("long"))
    val nq = posed.filter(col("sid") === querySid)
      .agg(max(col("pos")).as("nn"))
    val qry = posed.filter(col("sid") === querySid).crossJoin(broadcast(nq))
      .filter(col("pos") > col("nn") - win)
      .select((col("pos") - (col("nn") - win) - 1).as("o"), col("vi").as("qv"))
    // each factor is cast to DECIMAL BEFORE the multiply: a raw Long
    // product of two ×10⁴-quantized values overflows past |value| ≈
    // 9.6e5, well inside what DECIMAL(15,4) admits
    val qm = qry.agg(
      sum(col("qv").cast(DecimalType(38, 0))).as("sy"),
      sum(col("qv").cast(DecimalType(19, 0)) * col("qv").cast(DecimalType(19, 0)))
        .as("syy"))
    val ex = posed.crossJoin(broadcast(qry))
      .filter(col("pos") - col("o") >= 1)
      .select(col("sid"), (col("pos") - col("o")).as("start"), col("ts"),
        col("vi"), col("qv"))
    val wm = ex.groupBy(col("sid"), col("start"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("ts0"), max(col("ts")).as("ts1"),
        sum(col("vi").cast(DecimalType(38, 0))).as("sx"),
        sum(col("vi").cast(DecimalType(19, 0)) * col("vi").cast(DecimalType(19, 0)))
          .as("sxx"),
        sum(col("vi").cast(DecimalType(19, 0)) * col("qv").cast(DecimalType(19, 0)))
          .as("sxy"))
    wm.crossJoin(broadcast(qm)).crossJoin(broadcast(nq))
      .filter(col("n") === win && col("ts1") - col("ts0") === (win - 1) * step)
      // the query window matches itself at r = 1 by definition — excluded
      .filter(!(col("sid") === querySid && col("start") === col("nn") - (win - 1)))
      .withColumn("d1", lit(win) * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", lit(win) * col("syy") - col("sy") * col("sy"))
      .filter(col("d1") > 0 && col("d2") > 0)
      .select(col("sid"), col("start").as("start_pos"), col("ts0").as("start_ts"),
        round((lit(win) * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(col("d1").cast("double") * col("d2").cast("double")) + lit(1e-9), 6)
          .as("corr"))
      .orderBy(col("corr").desc, col("sid"), col("start_pos"))
      .limit(topK)
  }
}
