package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M1 (skeleton) — the workload-forecaster ensemble re-expressed
  * Spark-first: 20 models, model k trained on the stride-k subsample of
  * the series ending at the last observation (A14, reference
  * wm.py:79-84), each fit as an AR(2)-with-intercept by exact closed-form
  * OLS (Cramer on a 3×3 normal system), then 6-step recursive forecasts
  * per model (A17's per-model forecast frame).
  *
  * auto-ARIMA order search is NOT reproduced (SURVEY.md §7.4 risk 1:
  * bit-parity with pmdarima is unrealistic); the deviation is documented
  * and the ensemble/stride/blend machinery — the Spark-relevant part — is
  * exact and oracle-verified. All 20 fits happen in ONE DataFrame plan
  * (explode model ids × stride filter → groupBy model), not a driver
  * loop.
  *
  * The Cramer determinant / forecast-recursion expressions are shared SQL
  * template strings (`expr(...)` on the Spark side, verbatim in the
  * DuckDB oracle) so both engines run identical double arithmetic.
  */
object ArEnsemble {

  val detSql = "n3*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)"
  val det0Sql = "sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)"
  val det1Sql = "n3*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)"
  val det2Sql = "n3*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)"

  /** Forecast step k (1-based): f1 uses the last two strided values. */
  def forecastSql(k: Int): String = k match {
    case 1 => "c + a1*yl1 + a2*yl2"
    case 2 => "c + a1*f1 + a2*yl1"
    case n => s"c + a1*f${n - 1} + a2*f${n - 2}"
  }

  /** Input: single null-free series (ts, value). Output per model_id ∈
    * [1, models]: n3 (training rows), c/a1/a2, f1..f6. */
  def fitForecast(series: DataFrame, models: Int = 20, horizon: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast(DecimalType(15, 4))
    val posed = series
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("ts") % 1).orderBy("ts")) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("ts") % 1)))
    val strided = posed
      .select(col("pos"), col("n"), col("value"),
        explode(sequence(lit(1), lit(models))).as("model_id"))
      .filter((col("n") - 1 - col("pos")) % col("model_id") === 0)
    val wM = Window.partitionBy(col("model_id")).orderBy(col("pos"))
    val lagged = strided
      .withColumn("y1", lag(col("value"), 1).over(wM))
      .withColumn("y2", lag(col("value"), 2).over(wM))
      .withColumn("rend", row_number().over(
        Window.partitionBy(col("model_id")).orderBy(col("pos").desc)))
    val moments = lagged.filter(col("y2").isNotNull)
      .groupBy(col("model_id")).agg(
        count(lit(1)).as("n3"),
        sum(dec(col("value"))).cast("double").as("sy"),
        sum(dec(col("y1"))).cast("double").as("s1"),
        sum(dec(col("y2"))).cast("double").as("s2"),
        sum(dec(col("y1")) * dec(col("y1"))).cast("double").as("s11"),
        sum(dec(col("y2")) * dec(col("y2"))).cast("double").as("s22"),
        sum(dec(col("y1")) * dec(col("y2"))).cast("double").as("s12"),
        sum(dec(col("y1")) * dec(col("value"))).cast("double").as("s1y"),
        sum(dec(col("y2")) * dec(col("value"))).cast("double").as("s2y"))
    val lastVals = lagged.filter(col("rend") === 1)
      .select(col("model_id"), col("value").as("yl1"), col("y1").as("yl2"))
    var df = moments.join(lastVals, "model_id")
      .withColumn("det", expr(detSql))
      .withColumn("c", expr(det0Sql) / col("det"))
      .withColumn("a1", expr(det1Sql) / col("det"))
      .withColumn("a2", expr(det2Sql) / col("det"))
    (1 to horizon).foreach(k => df = df.withColumn(s"f$k", expr(forecastSql(k))))
    df.select(col("model_id") +: col("n3") +:
      (1 to horizon).map(k => round(col(s"f$k") + lit(1e-9), 4).as(s"f$k")): _*)
  }
}
