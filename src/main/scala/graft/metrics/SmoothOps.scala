package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A8–A11 — the workload-forecaster smoothing/blending stages
  * (reference analytics/app/workload/models.py:54-68,133-136):
  *
  *  - A8 Savitzky–Golay (window 51, poly 3) with scipy `mode='interp'`
  *    edge semantics: interior = sliding centered LSQ-poly eval, edges =
  *    fixed first/last-window poly fit evaluated at the edge positions;
  *  - A9 centered exponential rolling mean (window 60, tau 1);
  *  - A10 EWM blend across an ensemble axis (span 5, adjust=False,
  *    ignore_na=True — a null-skipping recursive fold, last column kept);
  *  - A11 centered rolling mean (window 120: 60 before, 59 after,
  *    min_periods=1).
  *
  * FP discipline: all convolution weights are precomputed on the driver,
  * rounded to fixed decimals, and shipped as exact DECIMAL literals;
  * contributions are summed as exact decimals (order-independent), so the
  * DuckDB oracles match bit-for-bit. A8/A9 use a contribution-explode plan
  * (each input row emits its (target, coeff·y) terms; groupBy target sums
  * them) — a linear-scaling shuffle, no per-row O(window²) expressions and
  * no whole-series arrays.
  */
object SmoothOps {

  private def dec4(c: Column): Column = c.cast(DecimalType(15, 4))

  // ---------------------------------------------------------------- A8 --

  /** Hat rows for LSQ poly-3 fit over x = −25..25: H(e)[i] = weight of
    * window value i in the polynomial evaluation at offset e. Solved via
    * the (symmetric, banded) normal equations — exact enough in doubles
    * for 12-decimal rounding (validated by the cubic-reproduction
    * property in the test suite). */
  private[metrics] def hatRow(e: Int, half: Int = 25, poly: Int = 3): Seq[Double] = {
    val xs = (-half to half).map(_.toDouble)
    val p = poly + 1
    // normal matrix M = X'X, rhs columns = X' (one per window position)
    val m = Array.tabulate(p, p)((a, b) => xs.map(x => math.pow(x, a + b)).sum)
    // invert M via Gauss-Jordan
    val inv = Array.tabulate(p, 2 * p)((a, b) =>
      if (b < p) m(a)(b) else if (b - p == a) 1.0 else 0.0)
    for (c0 <- 0 until p) {
      val piv = (c0 until p).maxBy(r => math.abs(inv(r)(c0)))
      val t = inv(c0); inv(c0) = inv(piv); inv(piv) = t
      val d = inv(c0)(c0)
      for (j <- 0 until 2 * p) inv(c0)(j) /= d
      for (r <- 0 until p if r != c0) {
        val f = inv(r)(c0)
        for (j <- 0 until 2 * p) inv(r)(j) -= f * inv(c0)(j)
      }
    }
    val minv = Array.tabulate(p, p)((a, b) => inv(a)(b + p))
    val ev = (0 until p).map(k => math.pow(e.toDouble, k))
    // H(e)[i] = ev · Minv · v(x_i)
    xs.map { x =>
      val vx = (0 until p).map(k => math.pow(x, k))
      (0 until p).map(a => ev(a) * (0 until p).map(b => minv(a)(b) * vx(b)).sum).sum
    }
  }

  private def r12(d: Double): java.math.BigDecimal =
    new java.math.BigDecimal(d).setScale(12, java.math.RoundingMode.HALF_UP)

  /** Flattened 12-decimal coefficient tables shared with the SQL oracles:
    * interior c[i] = H(0)[i]; head rows p∈[0,25) = H(p−25); tail rows
    * r∈[0,25) = H(r+1) applied to the last-51 window. */
  lazy val sgInterior: Seq[java.math.BigDecimal] = hatRow(0).map(r12)
  lazy val sgHead: Seq[java.math.BigDecimal] =
    (0 until 25).flatMap(p => hatRow(p - 25).map(r12))
  lazy val sgTail: Seq[java.math.BigDecimal] =
    (0 until 25).flatMap(r => hatRow(r + 1).map(r12))

  private def decArr(vals: Seq[java.math.BigDecimal]): Column =
    typedlit(vals.map(scala.math.BigDecimal(_)))

  /** A8 — SavGol(51, 3) smoothing per series. Input must be null-free and
    * have ≥ 51 rows per group (the reference shrinks the window for short
    * series; callers interpolate + guard upstream). */
  def savgol(df: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy("ts")
    val wAll = Window.partitionBy(g: _*)
    // base feeds four consumers (interior/head/tail contributions + the
    // final join); without persist the whole upstream (typically dense
    // grid → chunked interpolation) re-executes per consumer — 4× the
    // work (A/B-benched: 15.1s → 2.6s at sf0.1). No safe unpersist point
    // exists inside this lazy builder, so the cache is scope-registered:
    // a CacheScope.scoped caller releases it after its terminal action;
    // without a scope it stays for the session (LRU-evictable)
    val base = graft.CacheScope.persist(df
      .withColumn("pos", row_number().over(wOrd) - 1)
      .withColumn("n", count(lit(1)).over(wAll)))
    val cInt = decArr(sgInterior)
    val cHead = decArr(sgHead)
    val cTail = decArr(sgTail)
    // (20,12) is numerically redundant (coeffs have 12 decimals) but keeps
    // DuckDB's multiply on the INT128 path instead of overflowing INT64.
    val contrib = (c: Column) => (c.cast(DecimalType(20, 12)) * dec4(col("value"))).as("contrib")

    // interior: input pos → targets pos−d, d ∈ [−25,25], coeff c[d+25]
    val interior = base
      .select(g :+ col("pos") :+ col("n") :+ col("value") :+
        explode(sequence(lit(-25), lit(25))).as("d"): _*)
      .withColumn("tpos", col("pos") - col("d"))
      .filter(col("tpos") >= 25 && col("tpos") <= col("n") - 26)
      .select(g :+ col("tpos") :+ contrib(element_at(cInt, col("d") + 26)): _*)
    // head: input pos < 51 → targets p ∈ [0,25), coeff head[p*51 + pos]
    val head = base.filter(col("pos") < 51)
      .select(g :+ col("pos") :+ col("value") :+
        explode(sequence(lit(0), lit(24))).as("p"): _*)
      .select(g :+ col("p").as("tpos") :+
        contrib(element_at(cHead, col("p") * 51 + col("pos") + 1)): _*)
    // tail: input pos ≥ n−51 → targets n−25+r, coeff tail[r*51 + (pos−(n−51))]
    val tail = base.filter(col("pos") >= col("n") - 51)
      .select(g :+ col("pos") :+ col("n") :+ col("value") :+
        explode(sequence(lit(0), lit(24))).as("r"): _*)
      .select(g :+ (col("n") - 25 + col("r")).as("tpos") :+
        contrib(element_at(cTail,
          (col("r") * 51 + (col("pos") - (col("n") - 51)) + 1).cast("int"))): _*)

    val summed = interior.unionByName(head).unionByName(tail)
      .groupBy(g :+ col("tpos"): _*)
      .agg(sum(col("contrib")).as("sv"))
    base.join(summed.withColumnRenamed("tpos", "pos"), groupCols :+ "pos")
      .select(g :+ col("ts") :+
        round(col("sv").cast("double") + lit(1e-9), 4).as("value"): _*)
  }

  // ---------------------------------------------------------------- A9 --

  /** Exponential window weights w[j] = exp(−|j − (M−1)/2| / tau), rounded
    * to 15 decimals (shared with the SQL oracle). */
  def expWeights(m: Int = 60, tau: Double = 1.0): Seq[java.math.BigDecimal] =
    (0 until m).map(j => new java.math.BigDecimal(
      math.exp(-math.abs(j - (m - 1) / 2.0) / tau))
      .setScale(15, java.math.RoundingMode.HALF_UP))

  /** A9 — centered exponential-weighted rolling mean (window 60: offsets
    * −30..+29), min_periods=1, followed by linear interpolation of any
    * still-empty grid points (pandas chain, reference wm.py:64-68).
    * Contribution-explode plan over the dense grid. */
  def expRollingMean(dense: DataFrame, step: Long,
                     groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val wLit = typedlit(expWeights().map(scala.math.BigDecimal(_)))
    // dense feeds both the contribution explode and the grid join below;
    // persist so its (interpolated) upstream executes once (scope-
    // registered, same ownership story as savgol's base above)
    val dense1 = graft.CacheScope.persist(dense)
    val contribs = dense1.filter(col("value").isNotNull)
      .select(g :+ col("ts") :+ col("value") :+
        explode(sequence(lit(-30), lit(29))).as("d"): _*)
      .withColumn("t_out", col("ts") - col("d") * step)
      .withColumn("cf", element_at(wLit, col("d") + 31).cast(DecimalType(17, 15)))
      .groupBy(g :+ col("t_out"): _*)
      .agg(sum(col("cf") * dec4(col("value"))).as("num"),
        sum(col("cf")).as("den"))
    val joined = dense1.join(
      contribs.withColumnRenamed("t_out", "ts"), groupCols :+ "ts", "left")
      .withColumn("value", col("num").cast("double") / col("den").cast("double"))
      .drop("num", "den")
    graft.timeseries.TimeSeriesOps.interpolate(joined, groupCols)
  }

  // --------------------------------------------------------------- A10 --

  /** Per-level EWM fold template (α = 1/3, adjust=False, ignore_na=True),
    * valid in both Spark SQL and DuckDB — the SAME string drives both
    * engines, so the recursion is identical by construction. */
  def ewmLevelSql(k: Int): String =
    // 2e0/3e0, not 2.0/3.0: x.y literals parse as DECIMAL in both Spark
    // and DuckDB SQL but with different promotion rules; e-notation forces
    // identical DOUBLE arithmetic in both engines.
    s"CASE WHEN x$k IS NULL THEN acc${k - 1} WHEN acc${k - 1} IS NULL THEN x$k " +
      s"ELSE acc${k - 1}*(2e0/3e0) + x$k*(1e0/3e0) END"

  /** A10 — EWM blend across a synthetic 20-member ensemble axis where
    * member k's "prediction" at t is value(t−k·step) (a deterministic
    * stand-in for the ARIMA ensemble; the blend recursion is the operator
    * under test). Returns the final fold value per row. */
  def ewmBlend(dense: DataFrame, members: Int = 20,
               groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("ts")
    var df = dense
    (1 to members).foreach(k => df = df.withColumn(s"x$k", lag(col("value"), k).over(w)))
    df = df.withColumn("acc1", col("x1"))
    (2 to members).foreach(k => df = df.withColumn(s"acc$k", expr(ewmLevelSql(k))))
    df.select(groupCols.map(col) :+ col("ts") :+
      round(col(s"acc$members") + lit(1e-9), 4).as("blend"): _*)
  }

  // --------------------------------------------------------------- A11 --

  /** A11 — centered rolling mean, window 120 (60 before, 59 after —
    * pandas even-window convention), min_periods=1 (reference wm.py:135).
    */
  def centeredMean(dense: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val fr = Window.partitionBy(groupCols.map(col): _*).orderBy("ts")
      .rowsBetween(-60, 59)
    dense.withColumn("value",
      round(sum(dec4(col("value"))).over(fr).cast("double") /
        count(col("value")).over(fr) + lit(1e-9), 4))
  }
}
