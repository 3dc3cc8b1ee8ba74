package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness against a driver reference,
  * the pruning benefit it exists for (per-file bounding boxes shrink on
  * BOTH columns), and the layout plan shape. */
class ZOrderSpec extends SparkSpec {

  private def refInterleave(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the driver bit-interleave on a sample grid") {
    import spark.implicits._
    val pairs = for (a <- 0L to 40L by 7; b <- 0L to 40L by 5) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == refInterleave(a, b, 16), s"($a, $b)")
    }
  }

  test("z-order buckets have far smaller 2-D bounding boxes than row-order buckets") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("o_day"))
    val z = ZOrder.zAssign(orders, "o_custkey", "o_day", bits = 16, nBuckets = 16)
    def meanBoxArea(df: org.apache.spark.sql.DataFrame, bucket: String): Double =
      df.groupBy(col(bucket))
        .agg(((max(col("o_custkey")) - min(col("o_custkey"))) *
          (max(col("o_day")) - min(col("o_day")))).as("area"))
        .agg(avg(col("area"))).head.getDouble(0)
    val zArea = meanBoxArea(z, "zbucket")
    // row-order baseline: bucket by arrival order (orderkey ranges)
    val naive = orders.withColumn("nbucket", expr("o_orderkey div 100"))
    val nArea = meanBoxArea(naive, "nbucket")
    // the whole point of the layout: every z-bucket covers a small
    // rectangle in (custkey, day) space, so min/max footer stats prune
    // on EITHER predicate column; row-order buckets cover ~everything
    assert(zArea * 4 < nArea, s"z-order box $zArea vs row-order $nArea")
  }

  test("z-order layout concentrates a narrow custkey predicate into few files") {
    // the end-to-end payoff: write both layouts, run the same predicate,
    // count files holding matches — with footer min/max stats those are
    // the only files a pruning reader opens
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("o_day"))
    val (lo, hi) = {
      val r = orders.agg(min("o_custkey"), max("o_custkey")).head
      (r.getLong(0), r.getLong(1))
    }
    // a 1/16-wide custkey slice
    val width = math.max(1L, (hi - lo) / 16)
    val zDir = "target/tmp/zorder_z"
    val nDir = "target/tmp/zorder_naive"
    ZOrder.layout(orders, "o_custkey", "o_day", bits = 16, nFiles = 16)
      .write.mode("overwrite").parquet(zDir)
    orders.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(nDir)
    def filesWithMatches(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("o_custkey") >= lo + width && col("o_custkey") < lo + 2 * width)
        .select(input_file_name()).distinct().count()
    val (zf, nf) = (filesWithMatches(zDir), filesWithMatches(nDir))
    // arrival-order files each span ~all custkeys; z-files cover boxes
    assert(zf * 2 <= nf, s"z-order touches $zf files, row-order $nf")
  }

  test("layout() range-partitions by zval (the one shuffle a rewrite IS)") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("o_day"))
    val plan = ZOrder.layout(orders, "o_custkey", "o_day", bits = 16, nFiles = 8)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(500))
  }
}
