package graft

import graft.functions.SimpsonUdaf
import graft.metrics.{AggOps, SmoothOps}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Simpson (UDAF vs relational vs analytic truth) and SavGol properties. */
class AggSpec extends SparkSpec {

  import spark.implicits._

  private def mkSeries(vals: Seq[Double], step: Long = 10L): DataFrame =
    vals.zipWithIndex.map { case (v, i) => ("s", i * step, v) }
      .toDF("sid", "ts", "value")

  private val simpsonUdaf =
    udaf(SimpsonUdaf, Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))

  test("Simpson UDAF equals the relational weight-sum form") {
    val rnd = new Random(1)
    for (n <- Seq(1, 2, 3, 4, 51, 100)) {
      val vals = Seq.fill(n)(rnd.nextInt(100000) / 10.0)
      val df = mkSeries(vals)
      val rel = AggOps.simpsonRaw(df, 10L).head.getDouble(2)
      val viaUdaf = df.groupBy("sid")
        .agg(simpsonUdaf(col("ts"), col("value")).as("i")).head.getDouble(1)
      assert(math.abs(rel - viaUdaf) <= math.max(1e-9, math.abs(rel) * 1e-12),
        s"n=$n rel=$rel udaf=$viaUdaf")
    }
  }

  test("Simpson integrates quadratics exactly (odd sample count)") {
    // y = x^2 on [0, 100], 11 samples, h=10: exact integral = 1e6/3
    val vals = (0 to 10).map(i => math.pow(i * 10.0, 2))
    val integral = AggOps.simpsonRaw(mkSeries(vals), 10L).head.getDouble(2)
    assert(math.abs(integral - 1e6 / 3) < 1e-4)
  }

  test("Simpson trapezoid tail on even counts") {
    // y = 1 constant, 4 samples, h=10: integral of 3 intervals = 30
    val integral = AggOps.simpsonRaw(mkSeries(Seq(1d, 1d, 1d, 1d)), 10L).head.getDouble(2)
    assert(math.abs(integral - 30.0) < 1e-9)
  }

  test("SavGol(51,3) reproduces cubic polynomials (interior and edges)") {
    // y = cubic in position; a degree-3 filter must pass it through.
    def poly(x: Double) = 3.0 + 0.5 * x - 0.02 * x * x + 1e-4 * x * x * x
    val n = 120
    val df = (0 until n).map(i => ("s", i * 10L, math.rint(poly(i) * 1e4) / 1e4))
      .toDF("sid", "ts", "value")
    val out = SmoothOps.savgol(df).orderBy("ts").collect().map(_.getDouble(2))
    (0 until n).foreach { i =>
      assert(math.abs(out(i) - poly(i)) < 2e-3,
        s"pos $i: got ${out(i)}, want ${poly(i)}")
    }
  }

  test("binned means partition positions contiguously and cover all rows") {
    val df = mkSeries((1 to 100).map(_.toDouble))
    val bins = AggOps.binnedMeans(df, binCount = 10).orderBy("bin").collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(2)).sum == 100) // n_rows covers everything
    // equal-width over 100 rows: bin i mean = 10i + 5.5
    bins.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(3) - (10 * i + 5.5)) < 1e-6)
    }
  }

  test("regression metrics match hand-computed values") {
    val df = Seq(
      ("s", 10.0, 12.0), ("s", 20.0, 18.0), ("s", 30.0, 33.0), ("s", 40.0, 40.0))
      .toDF("sid", "y_true", "y_pred")
    val m = AggOps.regressionMetrics(df, Seq("sid")).head
    // errors: -2, 2, -3, 0 → abs 2,2,3,0; mae=1.75; medae=(2+2)/2=2;
    // mse=(4+4+9)/4=4.25; rmse=sqrt(4.25)
    assert(m.getAs[Double]("mae") == 1.75)
    assert(m.getAs[Double]("medae") == 2.0)
    assert(m.getAs[Double]("mse") == 4.25)
    assert(math.abs(m.getAs[Double]("rmse") - math.sqrt(4.25)) < 1e-6)
  }
}
