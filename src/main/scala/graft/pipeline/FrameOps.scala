package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-level utilities. */
object FrameOps {

  /** P4 — drop columns whose values are ALL null (pandas
    * `dropna(axis='columns', how='all')`, reference wm.py:132). One
    * aggregate pass decides; the projection itself is metadata-only. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.agg(count(lit(1)).as("__rows"),
      df.columns.map(c => count(col(c)).as(c)).toSeq: _*).head
    val dead = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    if (dead.isEmpty) df else df.drop(dead: _*)
  }
}
