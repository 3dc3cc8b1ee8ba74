package graft

import graft.timeseries.TimeSeriesOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** TimeSeries algebra: the reference's golden merge test plus seeded
  * property checks for the merge null-algebra and interpolation.
  */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def series(obs: Seq[(Long, Option[Double])]): DataFrame =
    obs.toDF("ts", "value").select(col("ts"), col("value").cast("double"))

  private def collectTsVals(df: DataFrame): Seq[(Long, Option[Double])] =
    df.orderBy("ts").collect().toSeq
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double])))

  /** The reference's one golden unit test (api_test.py:38-48): overlay
    * merge + interpolation of [0..3]=[1,2,2,3] and [7..10]=[8,9,9,10]
    * yields exactly [1,2,2,3,4.25,5.5,6.75,8,9,9,10] on [0..10] — in both
    * merge orders. */
  test("golden overlay merge matches the reference values in both orders") {
    val a = series((0L to 3L).zip(Seq(1d, 2d, 2d, 3d).map(Option(_))))
    val b = series((7L to 10L).zip(Seq(8d, 9d, 9d, 10d).map(Option(_))))
    val expected = Seq(1d, 2d, 2d, 3d, 4.25, 5.5, 6.75, 8d, 9d, 9d, 10d)
    for (pair <- Seq(Seq(a, b), Seq(b, a))) {
      val out = collectTsVals(mergeOverlay(pair, step = 1L))
      assert(out.map(_._1) == (0L to 10L))
      assert(out.map(_._2.get) == expected)
    }
  }

  test("mergeSum null algebra: null+x=x, x+y=x+y, null+null=null; commutative") {
    val a = series(Seq(0L -> Some(1.5), 1L -> None, 2L -> Some(2.0), 3L -> None))
    val b = series(Seq(0L -> Some(2.5), 1L -> Some(4.0), 3L -> None, 4L -> Some(7.0)))
    val ab = collectTsVals(mergeSum(a, b))
    assert(ab == Seq(0L -> Some(4.0), 1L -> Some(4.0), 2L -> Some(2.0),
      3L -> None, 4L -> Some(7.0)))
    assert(collectTsVals(mergeSum(b, a)) == ab)
  }

  test("mergeSumN equals iterated pairwise mergeSum on random series") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val ss = Seq.fill(3)(series((0L to 20L).flatMap(t =>
        if (rnd.nextDouble() < 0.7)
          Some(t -> (if (rnd.nextDouble() < 0.2) None else Some(rnd.nextInt(1000) / 10.0)))
        else None)))
      val nWay = collectTsVals(mergeSumN(ss))
      val pairwise = collectTsVals(
        ss.reduce((x, y) => mergeSum(x, y)).withColumn("value", round(col("value"), 4)))
      assert(nWay == pairwise)
    }
  }

  test("interpolation matches pandas limit_direction=both semantics") {
    val d = series(Seq(0L -> None, 1L -> Some(4.0), 2L -> None, 3L -> None,
      4L -> Some(10.0), 5L -> None))
    val out = collectTsVals(interpolate(d, groupCols = Seq.empty))
    assert(out == Seq(0L -> Some(4.0), 1L -> Some(4.0), 2L -> Some(6.0),
      3L -> Some(8.0), 4L -> Some(10.0), 5L -> Some(10.0)))
  }

  test("interpolation is idempotent and chunk-size invariant") {
    val rnd = new Random(7)
    val d = series((0L to 300L).map(t =>
      t -> (if (rnd.nextDouble() < 0.4) None else Some(rnd.nextInt(10000) / 100.0))))
    val big = collectTsVals(interpolate(d, Seq.empty, chunkSpan = 86400L))
    val small = collectTsVals(interpolate(d, Seq.empty, chunkSpan = 7L))
    assert(big == small, "chunked interpolation must be bit-exact vs any chunk size")
    val twice = collectTsVals(interpolate(interpolate(d, Seq.empty), Seq.empty))
    assert(twice == big, "interpolation must be idempotent")
  }

  test("resample walks backwards from the anchor with stride and limit") {
    val d = series((0L to 20L).map(t => t -> Some(t.toDouble)))
      .withColumn("sid", lit("s"))
    val out = resample(d, rate = 3, limit = 4).orderBy("ts")
      .select("ts", "value", "pos").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // anchor = 20; keep 20, 17, 14, 11 (pos from the end)
    assert(out.toSeq == Seq((11L, 11.0, 3L), (14L, 14.0, 2L), (17L, 17.0, 1L), (20L, 20.0, 0L)))
  }

  test("dense grid chunking is invariant to chunk size") {
    val s = series(Seq(100L -> Some(1.0), 350L -> Some(2.0)))
      .withColumn("sid", lit("x"))
    val g1 = collectTsVals(dense(s, step = 10L, chunk = 4).drop("sid"))
    val g2 = collectTsVals(dense(s, step = 10L, chunk = 8192).drop("sid"))
    assert(g1 == g2)
    assert(g1.map(_._1) == (100L to 350L by 10L))
  }
}
