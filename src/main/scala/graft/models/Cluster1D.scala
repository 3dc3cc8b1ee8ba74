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
    val base = df
      .withColumn("pos", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s1", sum(dec(col("y"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("s2", sum(dec(col("y")) * dec(col("y"))).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t1", sum(dec(col("y"))).over(wAll) - col("s1"))
      .withColumn("t2", sum(dec(col("y")) * dec(col("y"))).over(wAll) - col("s2"))
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
