package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M6 — the TWRES baseline (Time Window Resource Elasticity Scaling,
  * reference baselines/models.py:15-77): NNLS fit of maximum sustainable
  * throughput MST(x) ≈ c·[1, x, 1/x, 1/x²] (the reference's
  * `1/np.c_[1, 1/x, x, x²]` feature map), MSTW = MST·interval, min-opt
  * scale-out selection, and the rescale decision rule.
  *
  * The NNLS runs on the driver over the (tiny) collected training pairs —
  * mirroring the reference; scoring and selection are DataFrame ops.
  * No DuckDB oracle (active-set NNLS is not SQL-expressible); correctness
  * is covered by the KKT/golden checks in NnlsSpec and the driver's
  * rows-only smoke check.
  */
object TwresModel {

  def features(x: Double): Array[Double] = Array(1.0, x, 1.0 / x, 1.0 / (x * x))

  /** Fit MST coefficients on (scaleout, y) rows. */
  def fit(train: DataFrame): Array[Double] = {
    val rows = train.select(col("scaleout").cast("double"), col("y").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    Nnls.solve(rows.map(r => features(r._1)), rows.map(_._2))
  }

  /** Score scale-outs [minSo, maxSo]: mst, mstw = mst·interval, min-opt
    * flag and the TWRES decision for the given state. Decision
    * (reference bm.py:64-77): if predLoad ≥ MSTW(current) → min-opt;
    * elif avgLat > maxLat → current+1; else min-opt. Min-opt = first
    * scale-out with MSTW > predLoad, else argmax(MSTW − predLoad). */
  def decide(spark: SparkSession, coeffs: Array[Double], minSo: Int, maxSo: Int,
             interval: Double, predLoad: Double, currentScaleOut: Int,
             avgLat: Double, maxLat: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mst = (x: org.apache.spark.sql.Column) =>
      lit(coeffs(0)) + lit(coeffs(1)) * x + lit(coeffs(2)) / x +
        lit(coeffs(3)) / (x * x)
    val scored = spark.range(minSo, maxSo + 1).toDF("scaleout")
      .withColumn("mst", mst(col("scaleout").cast("double")))
      .withColumn("mstw", col("mst") * interval)
    // min-opt: first scaleout with mstw > predLoad, else argmax(mstw-predLoad)
    val w = Window.partitionBy(col("scaleout") % 1).orderBy(col("scaleout"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("scaleout") % 1)
    val flagged = scored
      .withColumn("meets", col("mstw") > predLoad)
      .withColumn("first_meets",
        col("meets") && count(when(col("meets"), 1)).over(w) === 0)
      .withColumn("any_meets", max(when(col("meets"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("slack_rank", row_number().over(
        Window.partitionBy(col("scaleout") % 1)
          .orderBy((col("mstw") - predLoad).desc, col("scaleout"))))
      .withColumn("is_min_opt",
        when(col("any_meets"), col("first_meets")).otherwise(col("slack_rank") === 1))
    val c = currentScaleOut.toDouble
    val mstwCurrent =
      (coeffs(0) + coeffs(1) * c + coeffs(2) / c + coeffs(3) / (c * c)) * interval
    val decision =
      if (predLoad >= mstwCurrent) "min_opt"
      else if (avgLat > maxLat) "scale_up_one"
      else "min_opt"
    flagged
      .withColumn("decision", lit(decision))
      .withColumn("new_scale_out",
        when(lit(decision) === "scale_up_one", lit(currentScaleOut + 1))
          .otherwise(max(when(col("is_min_opt"), col("scaleout"))).over(wAll)))
      .select(col("scaleout"), round(col("mst") + lit(1e-9), 4).as("mst"),
        round(col("mstw") + lit(1e-9), 4).as("mstw"), col("is_min_opt"),
        col("decision"), col("new_scale_out"))
  }
}
