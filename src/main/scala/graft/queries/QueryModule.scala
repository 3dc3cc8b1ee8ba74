package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of verifiable queries: each entry pairs a Spark
  * implementation with (where SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object Sql {
  /** Exact-sum pattern: casting each addend (a deterministic double) to a
    * decimal makes the aggregation order-independent, so Spark and DuckDB
    * produce bit-identical doubles regardless of partitioning. Used instead
    * of round() wherever many doubles are summed.
    */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  def decAvg(c: Column): Column = decSum(c) / count(c)

  /** DuckDB CTE chain producing `wl(ts, value)`: the interpolated,
    * 4-decimal-renormalized click workload (twin of
    * [[graft.Tables.clickWorkload]]); expects a `series` CTE in scope. */
  val clickWorkloadCtes: String =
    s"""ser AS (SELECT ts, value FROM series WHERE sid = 'click'),
       |bb AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM ser),
       |gg AS (SELECT UNNEST(range(t0, t1 + 3600, 3600)) AS ts FROM bb),
       |dd AS (SELECT gg.ts, ser.value FROM gg LEFT JOIN ser USING (ts)),
       |iii AS (SELECT ts, value,
       |  last_value(value IGNORE NULLS) OVER wp AS pv,
       |  last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
       |  first_value(value IGNORE NULLS) OVER wn AS nv,
       |  first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
       |  FROM dd
       |  WINDOW wp AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wn AS (ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |wl AS MATERIALIZED (SELECT ts, ROUND(CASE WHEN value IS NOT NULL THEN value
       |  WHEN pv IS NULL THEN nv
       |  WHEN nv IS NULL THEN pv
       |  ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END + 1e-9, 4) AS value
       |FROM iii)""".stripMargin

  /** DuckDB-side spelling of [[decSum]]/[[decAvg]]. */
  def decSumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def decAvgSql(e: String): String =
    s"${decSumSql(e)} / COUNT($e)"
}
