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

  /** DuckDB-side spelling of [[decSum]]/[[decAvg]]. */
  def decSumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def decAvgSql(e: String): String =
    s"${decSumSql(e)} / COUNT($e)"
}
