package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M4 — two-cluster 1-D latency clustering + A16 relabel-by-min stats.
  *
  * The reference clusters 1-D transformed latencies with Birch(n=2)
  * (reference latency/models.py:39-84); its downstream contract is only
  * the A16 relabel (cluster 0 = lower latencies). For one dimension and
  * k=2 the OPTIMAL clustering is a threshold split minimizing
  * within-cluster SSE, which is computable exactly: sort, prefix sums,
  * argmin over the n−1 split points. That is deterministic, shuffles once,
  * and — unlike Lloyd iterations — is SQL-expressible, so the DuckDB
  * oracle verifies it bit-for-bit.
  *
  * SSE(k) = (S2ₖ − S1ₖ²/k) + (T2ₖ − T1ₖ²/(n−k)) over exact decimal
  * prefix/suffix sums; argmin ties break toward the smaller split.
  */
object Cluster1D {

  /** Assign labels per group: input (groupCols, y); output adds
    * `label` (0 = cluster with the smaller values — A16 relabel) and the
    * split threshold. */
  def twoMeans(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    // Ties in y are interchangeable: prefix sums over equal values are
    // order-independent, and tied rows land on either side of a tied
    // threshold as an identical multiset.
    val wOrd = Window.partitionBy(g: _*).orderBy(col("y"))
    val wAll = Window.partitionBy(g: _*)
    val dec = (c: Column) => c.cast(DecimalType(18, 4))
    // both the sse argmin branch and the final label join read `base`:
    // persist so the sort+window pipeline runs once (scope-registered,
    // same ownership story as SmoothOps.savgol's base)
    val base = graft.CacheScope.persist(df
      .withColumn("pos", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s1", sum(dec(col("y"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("s2", sum(dec(col("y")) * dec(col("y"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t1", sum(dec(col("y"))).over(wAll) - col("s1"))
      .withColumn("t2", sum(dec(col("y")) * dec(col("y"))).over(wAll) - col("s2")))
    val sse = base.filter(col("pos") < col("n"))
      .withColumn("sse",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("pos")) +
          (col("t2").cast("double") - col("t1").cast("double") * col("t1").cast("double") / (col("n") - col("pos"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("sse"), col("pos"))))
      .filter(col("rk") === 1)
      .select(g :+ col("pos").as("split_pos") :+ col("y").as("threshold"): _*)
    base.join(sse, groupCols)
      .withColumn("label", when(col("pos") <= col("split_pos"), 0).otherwise(1))
      .select(g :+ col("y") :+ col("label") :+ col("threshold"): _*)
  }

  /** Shared Spark/DuckDB SQL texts for the M4 parity transform — sklearn
    * RobustScaler(quantile_range=(0.0, 1.0)) + log(max(1, x)) (reference
    * latency/models.py:39-45,56-57): center on the interpolated median,
    * scale by the 0th→1st-percentile range (1 when the range is 0,
    * sklearn's zero-scale rule), clamp at 1, natural log. The texts are
    * evaluated verbatim by both engines so the doubles are bit-identical;
    * the result is rounded to 6 decimals at source so downstream decimal
    * prefix sums stay exact. */
  /** The scaled-log transform over per-group quantile columns
    * (med_lo/med_hi, q_lo/q_hi, lo0, n). */
  val robustLogSql: String = {
    val med = qvSql("med_lo", "med_hi", "5e-1*(n-1) - FLOOR(5e-1*(n-1))")
    val hi01 = qvSql("q_lo", "q_hi", "1e-2*(n-1) - FLOOR(1e-2*(n-1))")
    s"""ROUND(LN(GREATEST(1e0,
       |  (y - ($med)) /
       |  (CASE WHEN ($hi01) - lo0 = 0e0 THEN 1e0 ELSE ($hi01) - lo0 END)
       |)) + 1e-9, 6)""".stripMargin
  }
  private def qvSql(lo: String, hi: String, frac: String): String =
    s"$lo + ($frac) * (COALESCE($hi, $lo) - $lo)"

  /** Attach the M4 parity transform column `t` to (groupCols, y) rows. */
  def robustLogTransform(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("y"))
    val wAll = Window.partitionBy(g: _*)
    val posed = df
      .withColumn("pos", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    // value at the interpolation's lower/upper index for quantile q:
    // idx = q·(n−1) zero-based → positions floor(idx)+1 and floor(idx)+2
    def at(q: String, off: Int) =
      max(when(col("pos") === expr(s"CAST(FLOOR($q*(n-1)) AS BIGINT) + $off"), col("y")))
    val qs = posed.groupBy(g: _*).agg(
      at("5e-1", 1).as("med_lo"), at("5e-1", 2).as("med_hi"),
      at("1e-2", 1).as("q_lo"), at("1e-2", 2).as("q_hi"),
      min(col("y")).as("lo0"), max(col("n")).as("n"))
    df.join(qs, groupCols).withColumn("t", expr(robustLogSql))
      .select(g :+ col("y") :+ col("t"): _*)
  }

  /** [[twoMeans]] splitting on a transform column `t` while carrying the
    * raw `y` (the reference clusters transformed latencies but reports
    * stats on the raw ones). Ordering is (t, y): deterministic inside
    * clamp-created t-ties, so the per-cluster y multisets are stable. */
  def twoMeansOn(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("t"), col("y"))
    val wAll = Window.partitionBy(g: _*)
    val dec = (c: Column) => c.cast(DecimalType(18, 6))
    // persist: the sse branch and the label join both read `base`, and its
    // upstream (robustLogTransform's quantile join) is itself multi-stage
    // (scope-registered, same ownership story as twoMeans above)
    val base = graft.CacheScope.persist(df
      .withColumn("pos", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s1", sum(dec(col("t"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("s2", sum(dec(col("t")) * dec(col("t"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t1", sum(dec(col("t"))).over(wAll) - col("s1"))
      .withColumn("t2", sum(dec(col("t")) * dec(col("t"))).over(wAll) - col("s2")))
    val sse = base.filter(col("pos") < col("n"))
      .withColumn("sse",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("pos")) +
          (col("t2").cast("double") - col("t1").cast("double") * col("t1").cast("double") / (col("n") - col("pos"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("sse"), col("pos"))))
      .filter(col("rk") === 1)
      .select(g :+ col("pos").as("split_pos") :+ col("t").as("threshold"): _*)
    base.join(sse, groupCols)
      .withColumn("label", when(col("pos") <= col("split_pos"), 0).otherwise(1))
      .select(g :+ col("y") :+ col("label") :+ col("threshold"): _*)
  }

  /** A16 — per-cluster stats, labels already ranked by min (label 0 holds
    * the smaller values by construction of [[twoMeans]]). */
  def clusterStats(labeled: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    labeled.groupBy(g :+ col("label"): _*).agg(
      count(lit(1)).as("n"),
      round(min(col("y")), 4).as("min_y"),
      round(max(col("y")), 4).as("max_y"),
      round(sum(col("y").cast(DecimalType(18, 4))).cast("double") / count(lit(1))
        + lit(1e-9), 4).as("mean_y"),
      round(max(col("threshold")), 4).as("threshold"))
  }
}
