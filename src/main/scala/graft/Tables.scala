package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md) plus the
  * canonical derived frames shared by many operators.
  *
  * All schemas are fixed by the parquet files — never inferred
  * (ref: the reference declares every schema in code, SURVEY.md §1.2).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so it
    * arrives as a nanosecond Long; normalize to a second-truncated timestamp
    * with exact integer division (a double division of ~1.7e18 ns would lose
    * precision). DuckDB oracles use FLOOR(epoch(ts)), which agrees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("cast(ts div 1000000000 as timestamp)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Canonical metric time-series derived from `events`: one series per
    * event_type, hour-aligned epoch-second grid, per-bucket summed values.
    * Mirrors the reference's Prometheus matrix → per-label TimeSeries shape
    * (reference PrometheusClient.java:77-115) on the driver testdata.
    * Rounded at source so every downstream oracle compare is FP-stable.
    */
  def series(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        col("event_type").as("sid"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("ts"))
      .agg(round(sum(col("value")), 4).as("value"))

  /** DuckDB-SQL equivalent of [[series]] (shared CTE text for oracles). */
  val seriesSql: String =
    """SELECT event_type AS sid,
      |       CAST(FLOOR(epoch(ts)/3600) AS BIGINT)*3600 AS ts,
      |       ROUND(SUM(value), 4) AS value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** The interpolated, 4-decimal-renormalized click workload series —
    * the shared single-series input of the forecaster/recovery queries.
    * (SQL twin: [[graft.queries.Sql.clickWorkloadCtes]].) */
  def clickWorkload(spark: SparkSession, dir: String): DataFrame =
    graft.timeseries.TimeSeriesOps.interpolate(
      graft.timeseries.TimeSeriesOps.dense(
        series(spark, dir).where(col("sid") === "click"), 3600L))
      .withColumn("value", round(col("value") + lit(1e-9), 4))
      .select("ts", "value")

  /** Synthetic profiles table derived deterministically from `orders`,
    * mirroring the reference's SQLite profiles store schema
    * (reference managers/DataManager.java:150-160). */
  def profiles(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir).select(
      col("o_orderkey").as("expid"),
      when(col("o_orderkey") % 2 === 0, "ADS").otherwise("CARS").as("gentype"),
      concat(lit("job_"), (col("o_custkey") % 3).cast("string")).as("jobname"),
      (lit(2) + col("o_orderkey") % 23).as("scaleout"),
      round(col("o_totalprice") / 100, 4).as("avglat"),
      round(col("o_totalprice"), 4).as("avgthr"),
      (col("o_orderkey") % 3 === 0).cast("long").as("isbckpres"),
      (unix_timestamp(col("o_orderdate")) + col("o_orderkey") % 100).as("startts"),
      (unix_timestamp(col("o_orderdate")) + col("o_orderkey") % 100 + 600).as("stopts"))

  /** DuckDB-SQL equivalent of [[profiles]]. */
  val profilesSql: String =
    """SELECT o_orderkey AS expid,
      |       CASE WHEN o_orderkey % 2 = 0 THEN 'ADS' ELSE 'CARS' END AS gentype,
      |       'job_' || CAST(o_custkey % 3 AS VARCHAR) AS jobname,
      |       2 + o_orderkey % 23 AS scaleout,
      |       ROUND(o_totalprice / 100, 4) AS avglat,
      |       ROUND(o_totalprice, 4) AS avgthr,
      |       CAST(o_orderkey % 3 = 0 AS BIGINT) AS isbckpres,
      |       CAST(epoch(o_orderdate) AS BIGINT) + o_orderkey % 100 AS startts,
      |       CAST(epoch(o_orderdate) AS BIGINT) + o_orderkey % 100 + 600 AS stopts
      |FROM orders""".stripMargin
}
