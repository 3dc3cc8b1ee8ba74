package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream shaping operators: gap sessionization and the per-key
  * as-of join — the two workhorse primitives for turning raw event logs
  * into training-ready features at corpus scale.
  *
  * Both are single-shuffle designs: one exchange on the partition key
  * (user / series id), then linear window scans inside each partition —
  * no self-joins, no range cross products, nothing that quadratically
  * amplifies a hot key. That is the property that survives a 100 TB
  * event log on a 1000-executor cluster.
  */
object EventOps {

  /** Gap-based sessionization: events of one user belong to the same
    * session while consecutive gaps are ≤ `gapSeconds`. Output is one row
    * per session with start/end/count and the exact (decimal-summed)
    * value total.
    *
    * The session boundary depends only on the SORTED timestamps of a
    * user's events (a tie has gap 0 and can never split), so the result
    * is deterministic under any shuffle order.
    *
    * Expects (user_id, ts: epoch-second long, value) columns.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(graft.queries.Sql.decSum(col("value")), 4).as("total_value"))
  }

  /** Per-key as-of join: each left row picks the right row with the
    * greatest `ts` ≤ its own `ts` within the same key (DuckDB/pandas
    * `ASOF JOIN` semantics, `<=` variant). Left rows before the first
    * right observation keep nulls.
    *
    * Implemented as the union-merge: tag right rows 0 and left rows 1
    * (left's remaining columns ride along, null-padded on right rows),
    * sort by (ts, tag) inside each key partition, and carry the last
    * non-null right value forward. ONE shuffle on the key, one linear
    * scan, no second join — per-key equi-join + max-filter would shuffle
    * the same data but build a quadratic candidate set on hot keys, and
    * a broadcast range join caps at small right sides; this form does
    * neither.
    *
    * `left` needs (key, ts) plus any pass-through columns; `right` is
    * (key, ts, value) of any orderable types — the null pads below take
    * their types from `right`'s actual schema, so a right frame with e.g.
    * timestamp ts or decimal value unions cleanly. Right rows sharing a
    * (key, ts) are resolved deterministically: the window ordering
    * tie-breaks on `value`, so the GREATEST value at the tied ts wins.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String): DataFrame = {
    val extra = left.columns.filterNot(c => c == key || c == "ts")
    val rightTagged = right.select(
      col(key) +: col("ts") +: lit(0).as("__src") +:
        col("ts").as("__rts") +: col("value").as("__rval") +:
        extra.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      col(key) +: col("ts") +: lit(1).as("__src") +:
        lit(null).cast(right.schema("ts").dataType).as("__rts") +:
        lit(null).cast(right.schema("value").dataType).as("__rval") +:
        extra.map(col(_)): _*)
    // right row sorts before a left row at the same ts -> <= semantics;
    // __rval (asc, nulls first — left rows carry null) makes duplicate
    // right ts deterministic: last() sees the greatest tied value last
    val w = Window.partitionBy(key).orderBy(col("ts"), col("__src"), col("__rval").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    rightTagged.unionByName(leftTagged)
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .withColumn("asof_value", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(col(key) +: col("ts") +: extra.map(col(_)) :+
        col("asof_ts") :+ col("asof_value"): _*)
  }
}
