package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's TimeSeries algebra re-expressed on DataFrames.
  *
  * Canonical shape: `[sid: String (optional series id), ts: Long
  * (epoch-second grid point), value: Double (nullable)]`. Missing data is an
  * explicit null row on a dense grid — the reference's load-bearing
  * invariant (reference structures/TimeSeries.java:35-51; SURVEY.md §1.3).
  *
  * Scale notes: every operator here partitions by `sid` — on a real cluster
  * each series' window functions run within its own partition group, so the
  * plan scales horizontally with the number of series. Only a degenerate
  * single-series global window would bottleneck (documented per method).
  */
object TimeSeriesOps {

  val obsSchema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  private def grp(groupCols: Seq[String]) = groupCols.map(col)

  /** Dense 1-per-`step` grid per series between each series' min/max ts,
    * left-joined with the observations: the canonical dense representation
    * (reference TimeSeries.java:45-50 materializes one slot per second).
    *
    * Grid materialization is two-level: an outer `sequence` of chunk heads
    * and an inner `sequence` of at most `chunk` grid points per head, so no
    * task ever materializes an array proportional to series length — a
    * year-long 1 Hz series is ~31M points, which as a single `sequence`
    * array would OOM the generating task at scale. The following join
    * shuffles on (groupCols, ts), redistributing the generated rows.
    */
  def dense(series: DataFrame, step: Long, groupCols: Seq[String] = Seq("sid"),
            chunk: Int = 8192): DataFrame = {
    val bounds = series.groupBy(grp(groupCols): _*)
      .agg(min("ts").as("t0"), max("ts").as("t1"))
    val heads = bounds.select(
      grp(groupCols) :+ col("t1") :+
        explode(sequence(col("t0"), col("t1"), lit(step * chunk))).as("h"): _*)
    val grid = heads.select(
      grp(groupCols) :+ explode(sequence(
        col("h"), least(col("h") + step * (chunk - 1), col("t1")), lit(step))).as("ts"): _*)
    grid.join(series, groupCols :+ "ts", "left")
      .select(grp(groupCols) :+ col("ts") :+ col("value"): _*)
  }

  /** Linear interpolation of interior nulls + flat extension at both edges,
    * matching pandas `interpolate(method='linear', limit_direction='both')`
    * (reference analytics/app/workload/schemes.py:41-54). Pure window
    * expressions — no UDF, stays in codegen.
    *
    * Scale design: a single series must not funnel through one window
    * partition, so rows are chunked into coarse time buckets of `chunkSpan`
    * seconds. Anchor lookups are two-level: per-row windows WITHIN a bucket
    * (partitioned by groupCols + bucket → parallel across buckets) plus a
    * bucket-level carry of each bucket's first/last non-null observation
    * (one row per bucket; the only cross-bucket window runs over that tiny
    * relation). Arithmetic is identical to the global-window formulation —
    * results are bit-exact regardless of chunkSpan.
    */
  def interpolate(df: DataFrame, groupCols: Seq[String] = Seq("sid"),
                  chunkSpan: Long = 86400L): DataFrame = {
    val g = grp(groupCols)
    val withB = df.withColumn("__b", floor(col("ts") / chunkSpan).cast("long"))
    val wIn = Window.partitionBy(g :+ col("__b"): _*).orderBy("ts")
    val wInPrev = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wInNext = wIn.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pvIn = last(col("value"), ignoreNulls = true).over(wInPrev)
    val ptIn = last(when(col("value").isNotNull, col("ts")), ignoreNulls = true).over(wInPrev)
    val nvIn = first(col("value"), ignoreNulls = true).over(wInNext)
    val ntIn = first(when(col("value").isNotNull, col("ts")), ignoreNulls = true).over(wInNext)

    // One row per (series, bucket): the bucket's first/last non-null obs.
    val bSum = withB.groupBy(g :+ col("__b"): _*).agg(
      max(when(col("value").isNotNull, struct(col("ts"), col("value")))).as("__lastNN"),
      min(when(col("value").isNotNull, struct(col("ts"), col("value")))).as("__firstNN"))
    // Cross-bucket carry: tiny relation (nBuckets rows/series, i.e. data
    // volume O(series_len / chunkSpan)), so a single partition here is
    // deliberate and bounded. The `__b % 1` key (always 0, but not
    // constant-foldable) keeps the partition spec non-empty for the
    // ungrouped case — an empty spec would be flagged as an unbounded
    // global window, which this is not.
    val wB = Window.partitionBy(
      (if (g.isEmpty) Seq(col("__b") % 1) else g): _*).orderBy("__b")
    val carry = bSum.select(
      g :+ col("__b") :+
        last(col("__lastNN"), ignoreNulls = true)
          .over(wB.rowsBetween(Window.unboundedPreceding, -1)).as("__cp") :+
        first(col("__firstNN"), ignoreNulls = true)
          .over(wB.rowsBetween(1, Window.unboundedFollowing)).as("__cn"): _*)

    val joined = withB.join(carry, groupCols :+ "__b", "left")
    val pv = coalesce(pvIn, col("__cp.value"))
    val pt = coalesce(ptIn, col("__cp.ts"))
    val nv = coalesce(nvIn, col("__cn.value"))
    val nt = coalesce(ntIn, col("__cn.ts"))
    joined.withColumn("value",
      when(col("value").isNotNull, col("value"))
        .when(pv.isNull, nv)   // leading nulls → flat fill with first valid
        .when(nv.isNull, pv)   // trailing nulls → flat fill with last valid
        .otherwise(pv + (nv - pv) * (col("ts") - pt) / (nt - pt)))
      .drop("__b", "__cp", "__cn")
  }

  /** J1 — summing temporal full-outer merge of two series: one-sided
    * timestamps take the present value, shared timestamps sum (null+x=x,
    * null+null=null) (reference TimeSeries.java:109-138).
    */
  def mergeSum(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("ts"), col("value").as("va"))
    val r = b.select(col("ts"), col("value").as("vb"))
    l.join(r, Seq("ts"), "full_outer")
      .select(col("ts"),
        when(col("va").isNull && col("vb").isNull, lit(null).cast("double"))
          .otherwise(coalesce(col("va"), lit(0.0)) + coalesce(col("vb"), lit(0.0)))
          .as("value"))
  }

  /** J2 — n-way summing merge. The reference parallelizes a binary tree of
    * pairwise merges over an ExecutorService (TimeSeries.java:140-158); in
    * Spark a single union + groupBy shuffles once and parallelizes natively.
    * All-null groups stay null (count(value)=0 ⇒ null), matching J1.
    */
  def mergeSumN(dfs: Seq[DataFrame]): DataFrame = {
    val u = dfs.map(_.select("ts", "value")).reduce(_ unionByName _)
    u.groupBy("ts").agg(
      when(count(col("value")) === 0, lit(null).cast("double"))
        .otherwise(round(sum(col("value").cast(DecimalType(30, 6))).cast("double"), 4))
        .as("value"))
  }

  /** J3 — overlay merge (Python semantics): dense index over the global
    * min→max range; series written in end-timestamp order so later series
    * overwrite earlier at shared timestamps; then interpolated (reference
    * analytics/app/workload/schemes.py:73-94). Ties on end timestamp are
    * broken by input position (later input wins — pandas stable sort).
    */
  def mergeOverlay(dfs: Seq[DataFrame], step: Long): DataFrame = {
    val tagged = dfs.zipWithIndex.map { case (df, i) =>
      df.select(col("ts"), col("value"), lit(i).as("src"))
    }.reduce(_ unionByName _)
    val withEnd = tagged.withColumn("src_end",
      max("ts").over(Window.partitionBy("src")))
    val w = Window.partitionBy("ts")
      .orderBy(col("src_end").desc, col("src").desc)
    val picked = withEnd.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select("ts", "value")
    val densified = dense(picked.withColumn("sid", lit("m")), step)
      .drop("sid")
    interpolate(densified, Seq.empty)
  }

  /** A1 — null-skipping scalar aggregates per series, including the
    * reference's 0-clamp quirk: Java min/max are initialized to 0, so
    * min() can never exceed 0 and max() can never go below 0
    * (reference TimeSeries.java:281-305). Both the clean and quirk values
    * are emitted so callers choose which contract they need.
    */
  def tsAgg(df: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame =
    df.groupBy(grp(groupCols): _*).agg(
      round(sum(col("value").cast(DecimalType(30, 6))).cast("double") / count(col("value")) + lit(1e-9), 4).as("avg_value"),
      round(min(col("value")), 4).as("min_value"),
      round(max(col("value")), 4).as("max_value"),
      when(count(col("value")) === 0, lit(null).cast("double"))
        .otherwise(round(sum(col("value").cast(DecimalType(30, 6))).cast("double"), 4)).as("sum_value"),
      round(least(min(col("value")), lit(0.0)), 4).as("min_clamped"),
      round(greatest(max(col("value")), lit(0.0)), 4).as("max_clamped"),
      count(col("value")).as("n_obs"))

  /** P6 — inclusive time slice (reference schemes.py:96-101). */
  def slice(df: DataFrame, start: Long, end: Long): DataFrame =
    df.filter(col("ts").between(start, end))

  /** P7 — positional slice [startIdx, endIdx) per series
    * (reference TimeSeries.java:217-225). */
  def subSample(df: DataFrame, startIdx: Int, endIdxExcl: Int,
                groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val w = Window.partitionBy(grp(groupCols): _*).orderBy("ts")
    df.withColumn("pos", row_number().over(w) - 1)
      .filter(col("pos") >= startIdx && col("pos") < endIdxExcl)
  }

  /** A13 — strided backwards resample: walk back from each series' anchor
    * (its max ts), keep every `rate`-th sample, at most `limit`
    * (reference TimeSeries.java:185-215; result is ascending there — row
    * order is not part of the contract here, `pos` encodes it).
    */
  def resample(df: DataFrame, rate: Int, limit: Int,
               groupCols: Seq[String] = Seq("sid")): DataFrame = {
    val w = Window.partitionBy(grp(groupCols): _*).orderBy(col("ts").desc)
    df.withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % rate === 0 && col("rn") <= (limit - 1) * rate + 1)
      .withColumn("pos", ((col("rn") - 1) / rate).cast("long"))
      .drop("rn")
  }

  /** O10 — first/last observation per series (reference
    * TimeSeries.java:256-264). */
  def firstLast(df: DataFrame, groupCols: Seq[String] = Seq("sid")): DataFrame =
    df.groupBy(grp(groupCols): _*).agg(
      min("ts").as("first_ts"), min_by(col("value"), col("ts")).as("first_value"),
      max("ts").as("last_ts"), max_by(col("value"), col("ts")).as("last_value"))

  /** S1 — pipe-separated `timestamp|value` CSV scan with literal "null"
    * markers (reference TimeSeries.java:53-85; FIXTURES.md §1). PERMISSIVE
    * mode mirrors the reference's log-and-skip per-line error handling. */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "|").option("header", "true")
      .option("nullValue", "null").option("mode", "PERMISSIVE")
      .schema(StructType(Seq(
        StructField("timestamp", LongType), StructField("value", DoubleType))))
      .csv(path)
      .select(col("timestamp").as("ts"), col("value"))

  /** S2 — CSV sink, same format (reference TimeSeries.java:87-107). */
  def toCsv(df: DataFrame, path: String): Unit =
    df.select(col("ts").as("timestamp"), col("value"))
      .write.mode("overwrite")
      .option("sep", "|").option("header", "true").option("nullValue", "null")
      .csv(path)
}
