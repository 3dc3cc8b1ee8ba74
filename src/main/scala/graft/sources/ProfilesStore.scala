package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** S5/S6/S7 — the profiles store as a parquet-backed table with append
  * and delete, mirroring the reference's SQLite profiles/predictions DDL
  * + insert/delete surface (reference managers/DataManager.java:148-242).
  *
  * Delete is copy-on-write (write the anti-filtered snapshot, atomic-ish
  * directory swap) — the standard parquet-table mutation pattern when no
  * transactional table format is available; on a real deployment this
  * maps 1:1 onto Delta/Iceberg DELETE.
  */
object ProfilesStore {

  def init(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Delete rows matching `pred` (copy-on-write + swap). */
  def delete(spark: SparkSession, path: String, pred: Column): Unit = {
    val tmp = path + "__cow"
    read(spark, path).filter(!pred).write.mode("overwrite").parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }
}
