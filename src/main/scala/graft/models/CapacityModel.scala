package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M2 — the capacity model: ridge regression scaleOut → max sustainable
  * throughput with leave-one-out CV over the alpha grid (0.1, 1, 10),
  * mirroring sklearn RidgeCV's closed-form LOO residual e/(1−h)
  * (reference recoverytime/models.py:20-31).
  *
  * Everything is closed-form over exact-decimal sums (x = scaleOut int,
  * y = 4-decimal throughput): per-alpha slope = Sxy_c/(Sxx_c + α) on
  * centered data, intercept unpenalized; LOO score = mean of
  * (e/(1−h))² with h = 1/n + x_c²/(Sxx_c + α), summed as 4-decimal
  * decimals for order independence. Identical doubles on both engines.
  *
  * The plan is pure DataFrame ops (stats 1-row × alphas 3-row cross join,
  * broadcast back over the training rows) — no driver-side math, so the
  * same code would run with a billion training rows.
  */
object CapacityModel {

  /** Fit on (scaleout, y) training rows → single best-alpha row
    * (alpha, slope, intercept, score). */
  def fit(train: DataFrame): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val stats = train.agg(
      count(lit(1)).as("n"),
      sum(col("scaleout")).cast("double").as("sx"),
      sum(col("y").cast(DecimalType(18, 4))).cast("double").as("sy"),
      sum(col("scaleout").cast(DecimalType(18, 0)) * col("y").cast(DecimalType(18, 4)))
        .cast("double").as("sxy"),
      sum((col("scaleout") * col("scaleout")).cast(DecimalType(38, 0)))
        .cast("double").as("sxx"))
    val alphas = Seq(0.1, 1.0, 10.0).toDF("alpha")
    val params = alphas.crossJoin(broadcast(stats))
      .withColumn("xbar", col("sx") / col("n"))
      .withColumn("ybar", col("sy") / col("n"))
      .withColumn("sxxc", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("sxyc", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("slope", col("sxyc") / (col("sxxc") + col("alpha")))
      .withColumn("intercept", col("ybar") - col("slope") * col("xbar"))
    val scored = train.crossJoin(broadcast(params))
      .withColumn("e", col("y") - (col("intercept") + col("slope") * col("scaleout")))
      .withColumn("h",
        lit(1.0) / col("n") +
          (col("scaleout") - col("xbar")) * (col("scaleout") - col("xbar")) /
            (col("sxxc") + col("alpha")))
      .withColumn("loo", round((col("e") / (lit(1.0) - col("h"))) *
        (col("e") / (lit(1.0) - col("h"))) + lit(1e-9), 4).cast(DecimalType(30, 4)))
      .groupBy(col("alpha"), col("slope"), col("intercept"))
      .agg((sum(col("loo")).cast("double") / count(lit(1))).as("score"))
    scored.orderBy(col("score"), col("alpha")).limit(1)
  }

  /** Predicted capacity per scale-out in [minSo, maxSo]. */
  def predict(spark: SparkSession, fitted: DataFrame, minSo: Int, maxSo: Int): DataFrame =
    spark.range(minSo, maxSo + 1).toDF("scaleout")
      .crossJoin(broadcast(fitted))
      .select(col("scaleout"),
        (col("intercept") + col("slope") * col("scaleout")).as("capacity"),
        col("alpha"))
}
