package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — the multi-column layout lever for
  * scan pruning at 100 TB. A sort on one column gives perfect file-level
  * min/max pruning for THAT column and none for any other; interleaving
  * the bits of two columns and sorting by the interleaved value gives
  * every file a small bounding BOX in (a, b) space, so predicates on
  * EITHER column (or both) skip most files from parquet footer stats
  * alone. This is the layout Delta/Iceberg `OPTIMIZE ZORDER BY` applies;
  * here it is a plain column expression + `repartitionByRange`, nothing
  * engine-specific.
  *
  * The z-value arithmetic is pure long bit operations (normalize each
  * column to `bits` bits by exact integer min-max scaling, then
  * interleave), so the mapping is engine-exact and the DuckDB oracle
  * replays it bit-for-bit.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * a's bit i → output bit 2i, b's bit i → output bit 2i+1. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Exact integer min-max scaling of column `x` onto [0, 2^bits) as a
    * SQL fragment (`div`, not `/` — double division goes inexact past
    * 2^53, integer division never does). Degenerate (constant) columns
    * map to 0. `lo`/`hi` name the broadcast 1-row aggregate columns. */
  def scaleToSql(x: String, lo: String, hi: String, bits: Int): String =
    s"CASE WHEN $hi = $lo THEN CAST(0 AS BIGINT) " +
      s"ELSE (($x - $lo) * ${(1L << bits) - 1}) div ($hi - $lo) END"

  /** Z-value assignment for `df` on two long columns: returns the input
    * keyed by (za, zb, zval, zbucket) where zbucket is an equal-width
    * zval range — the file id a writer would sort into. `nBuckets` plays
    * the role of target file count. One 1-row min/max aggregate
    * (broadcast) + per-row bit arithmetic; no shuffle until the caller
    * lays out. */
  def zAssign(df: DataFrame, colA: String, colB: String, bits: Int,
              nBuckets: Int): DataFrame = {
    val stats = df.agg(
      min(col(colA)).as("loA"), max(col(colA)).as("hiA"),
      min(col(colB)).as("loB"), max(col(colB)).as("hiB"))
    val bucketWidth = (1L << (2 * bits)) / nBuckets
    df.crossJoin(broadcast(stats))
      .withColumn("za", expr(scaleToSql(colA, "loA", "hiA", bits)))
      .withColumn("zb", expr(scaleToSql(colB, "loB", "hiB", bits)))
      .withColumn("zval", zValue(col("za"), col("zb"), bits))
      .withColumn("zbucket", expr(s"zval div $bucketWidth"))
      .drop("loA", "hiA", "loB", "hiB")
  }

  /** The actual layout: range-partition by zval into `nFiles` output
    * partitions and sort within each — every written file then covers a
    * contiguous z-range, i.e. a small (a, b) bounding box for footer
    * stats. This is the one global shuffle a layout rewrite IS. */
  def layout(df: DataFrame, colA: String, colB: String, bits: Int,
             nFiles: Int): DataFrame =
    zAssign(df, colA, colB, bits, nFiles)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
}
