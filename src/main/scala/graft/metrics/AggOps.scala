package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A7 equal-width binned means, A15 regression metrics, and the relational
  * (window + exact-decimal weight-sum) formulation of A12 Simpson
  * integration. All aggregates use exact DECIMAL sums of ≤4-decimal inputs
  * so DuckDB oracles match bit-for-bit; per-row double ops (ratios) are
  * rounded to 8 decimals before the decimal cast, which removes sum-order
  * dependence without cross-engine cast ambiguity.
  */
object AggOps {

  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** A7 — equal-width binned means over row position per series
    * (reference recoverytime/models.py:33-39: linspace slice boundaries →
    * per-bin mean; the downstream peak is max(mean)). Bin of position p is
    * p·binCount div n — integer arithmetic, no FP boundaries. */
  def binnedMeans(series: DataFrame, binCount: Int,
                  groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
    series.filter(col("value").isNotNull)
      .withColumn("pos", row_number().over(w.orderBy("ts")) - 1)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("bin", expr(s"pos * $binCount div n"))
      .groupBy(g :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_rows"),
        round(sum(dec4(col("value"))).cast("double") / count(lit(1)) + lit(1e-9), 4)
          .as("mean_value"))
  }

  /** A15 — regression metrics between `y_true` and `y_pred` columns, per
    * group (reference analytics/app/common/models.py:41-51): MAE, median
    * AE (np.median semantics: mean of the two middle order statistics),
    * MAPE (over rows with y_true ≠ 0), MSE, RMSE. */
  def regressionMetrics(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    // (15,4) keeps the square at (31,8) — inside both engines' 38-digit
    // cap, so no silent precision-overflow rounding.
    val e = (dec4(col("y_true")) - dec4(col("y_pred"))).cast(DecimalType(15, 4))
    val withE = df.filter(col("y_pred").isNotNull && col("y_true").isNotNull)
      .withColumn("abs_e", abs(e))
      .withColumn("sq_e", e * e)
      .withColumn("ape",
        when(col("y_true") =!= 0.0,
          round(abs(e).cast("double") / abs(col("y_true")), 8).cast(DecimalType(30, 8))))

    val w = Window.partitionBy(g: _*)
    val med = withE
      .withColumn("rn", row_number().over(w.orderBy(col("abs_e"), col("y_true"))))
      .withColumn("nn", count(lit(1)).over(w))
      .filter(col("rn") === expr("(nn + 1) div 2") || col("rn") === expr("(nn + 2) div 2"))
      .groupBy(g: _*)
      .agg(((min(col("abs_e")).cast("double") + max(col("abs_e")).cast("double")) / 2)
        .as("medae"))

    val agg = withE.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      (sum(col("abs_e")).cast("double") / count(lit(1))).as("mae"),
      (sum(col("ape")).cast("double") / count(col("ape"))).as("mape"),
      (sum(col("sq_e")).cast("double") / count(lit(1))).as("mse"))

    agg.join(med, groupCols)
      .select(g :+ col("n") :+
        round(col("mae") + lit(1e-9), 6).as("mae") :+
        round(col("medae") + lit(1e-9), 6).as("medae") :+
        round(col("mape") + lit(1e-9), 6).as("mape") :+
        round(col("mse") + lit(1e-9), 6).as("mse") :+
        round(sqrt(col("mse")) + lit(1e-9), 6).as("rmse"): _*)
  }

  /** A12 (relational form) — composite Simpson integral per series over a
    * uniform grid of step `h`; even counts fall back to trapezoid on the
    * last interval. Same semantics as [[graft.functions.SimpsonUdaf]];
    * this form is pure window+aggregate (scales as a groupBy, oracle-able
    * in SQL), the UDAF form serves Dataset-typed callers. Input must be
    * null-free (interpolate first). */
  /** Unrounded variant of [[simpsonIntegral]]: per group, (n, integral). */
  def simpsonRaw(dense: DataFrame, h: Long,
                 groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
    val withPos = dense
      .withColumn("pos", row_number().over(w.orderBy("ts")) - 1)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("m", expr("n - (1 - n % 2)")) // odd-length Simpson prefix
      .withColumn("wgt",
        when(col("n") < 2, lit(0))
          .when(col("m") < 3, lit(0))           // n == 2: trapezoid only
          .when(col("pos") >= col("m"), lit(0)) // final point of even n: trapezoid only
          .when(col("pos") === 0 || col("pos") === col("m") - 1, lit(1))
          .when(col("pos") % 2 === 1, lit(4))
          .otherwise(lit(2)))
    withPos.groupBy(g: _*).agg(
      max(col("n")).as("n"),
      (sum(dec4(col("value")) * col("wgt")).cast("double") * h / 3 +
        when(max(col("n")) % 2 === 0,
          (max(when(col("pos") === col("n") - 2, dec4(col("value")))) +
            max(when(col("pos") === col("n") - 1, dec4(col("value")))))
            .cast("double") * h / 2)
          .otherwise(lit(0.0))).as("integral"))
  }

  def simpsonIntegral(dense: DataFrame, h: Long,
                      groupCols: Seq[String] = Seq("sid")): DataFrame =
    simpsonRaw(dense, h, groupCols)
      .select(groupCols.map(col) :+ col("n") :+
        round(col("integral") + lit(1e-9), 4).as("integral"): _*)
}
