package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed parquet tables — the storage-layout lever for
  * shuffle-free joins at 100 TB.
  *
  * A join between two tables bucketed by the same key into the same
  * bucket count needs NO exchange: every bucket pair is co-located by
  * construction, so the sort-merge join reads matching buckets directly
  * (Spark only inserts per-partition sorts, or skips them too when the
  * buckets are written sorted). On a 1000-executor cluster this turns
  * the dominant cost of a fact-fact join — shuffling both sides — into
  * zero network traffic; the price is paid once at write time. The same
  * layout also serves bucket pruning for point lookups on the key.
  *
  * Spark only recognizes bucketing through the catalog, so tables are
  * written with `saveAsTable` + an explicit `path` (external tables: the
  * data lives where the caller says, the catalog entry carries the
  * bucket spec). `BucketingSpec` pins the no-exchange plan shape.
  */
object BucketedStore {

  /** Write `df` as an external bucketed table: `buckets` hash buckets on
    * `key`, each bucket file sorted by `key` (enables merge-join without
    * even a per-partition sort). Overwrites any existing table entry of
    * the same name. `mode(overwrite)` replaces the files at `path`; a
    * caller reusing a path that previously backed a table with a
    * DIFFERENT bucket spec must not read that path directly mid-write. */
  def write(df: DataFrame, table: String, path: String, key: String,
            buckets: Int): Unit = {
    val spark = df.sparkSession
    require(table.matches("[A-Za-z0-9_.]+"), s"invalid table identifier: $table")
    spark.sql(s"DROP TABLE IF EXISTS `${table.replace(".", "`.`")}`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog — a plain `spark.read.parquet(path)` would lose it and
    * reintroduce the shuffle). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
