package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.functions._

/** Fixed-point power iteration PCA: the loading must actually be the
  * dominant variance direction, not just a deterministic vector.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic cloud with a known dominant axis: x = t·a + noise,
    * where a is a fixed unit-ish direction and Var(t) dwarfs the noise.
    * The top principal component must align with a. */
  private lazy val anisotropic = {
    val rnd = new scala.util.Random(7)
    val dir = Array.fill(64)(rnd.nextGaussian().toFloat)
    val nrm = math.sqrt(dir.map(x => x.toDouble * x).sum).toFloat
    val a = dir.map(_ / nrm)
    val rows = (0 until 200).map { id =>
      val t = rnd.nextGaussian().toFloat * 3f
      val v = a.map(_ * t).zip(Array.fill(64)(rnd.nextGaussian().toFloat * 0.1f))
        .map { case (s, n) => s + n }
      (id.toLong, v.toSeq)
    }
    (a, rows.toDF("vec_id", "embedding"))
  }

  private def cosine(u: Array[Double], w: Array[Double]): Double = {
    val d = u.zip(w).map { case (x, y) => x * y }.sum
    d / math.sqrt(u.map(x => x * x).sum * w.map(x => x * x).sum)
  }

  test("loading aligns with the planted dominant direction") {
    val (a, df) = anisotropic
    val v = VectorOps.pcaLoading(df).orderBy("i")
      .select(col("loading")).as[Long].collect().map(_.toDouble)
    val c = math.abs(cosine(a.map(_.toDouble), v))
    assert(c > 0.99, s"|cos(loading, planted axis)| = $c")
  }

  test("8 iterations have converged: more iterations do not move the axis") {
    val (_, df) = anisotropic
    val v8 = VectorOps.pcaLoading(df, iters = 8).orderBy("i")
      .select(col("loading")).as[Long].collect().map(_.toDouble)
    val v20 = VectorOps.pcaLoading(df, iters = 20).orderBy("i")
      .select(col("loading")).as[Long].collect().map(_.toDouble)
    assert(math.abs(cosine(v8, v20)) > 0.9999)
  }

  test("projection equals the explicit centered dot with the fitted axis") {
    val (_, df) = anisotropic
    val (mu, v) = VectorOps.pcaFit(df)
    val got = VectorOps.pcaProject(df).orderBy("vec_id")
      .select(col("pc1")).as[Long].collect()
    val qs = df.orderBy("vec_id")
      .select(VectorOps.quant.as("q")).as[Seq[Long]].collect()
    val want = qs.map(q =>
      q.zipWithIndex.map { case (x, i) => (x - mu(i)) * v(i) }.sum)
    assert(got.toSeq == want.toSeq)
  }

  test("projection variance along pc1 dominates every coordinate axis") {
    val (_, df) = anisotropic
    // variance of the (unit-normalized) pc1 projection vs the variance of
    // each raw coordinate: the dominant direction must capture at least as
    // much as any single axis
    val (mu, v) = VectorOps.pcaFit(df)
    val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
    val qs = df.select(VectorOps.quant.as("q")).as[Seq[Long]].collect()
    val proj = qs.map(q =>
      q.zipWithIndex.map { case (x, i) => (x - mu(i)) * v(i) }.sum / vn)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val pcVar = variance(proj.map(_.toDouble))
    val coordVars = (0 until 64).map(i => variance(qs.map(_(i).toDouble)))
    assert(pcVar >= coordVars.max * 0.999,
      s"pc1 variance $pcVar < best coordinate ${coordVars.max}")
  }

  test("ABTT residuals carry ~no component along the removed direction") {
    val (_, df) = anisotropic
    val (mu, v) = VectorOps.pcaFit(df)
    val resid = VectorOps.abttResiduals(df)
      .groupBy("vec_id")
      .agg(collect_list(struct(col("i"), col("resid"))).as("rs"))
      .select(col("vec_id"), expr("transform(array_sort(rs), s -> s.resid)").as("r"))
      .as[(Long, Seq[Long])].collect().toMap
    val qs = df.select(col("vec_id"), VectorOps.quant.as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    val before = qs.map { case (id, q) =>
      math.abs(q.zipWithIndex.map { case (x, i) => (x - mu(i)) * v(i) }.sum.toDouble)
    }
    val after = resid.values.map(r =>
      math.abs(r.zipWithIndex.map { case (x, i) => x * v(i) }.sum.toDouble))
    // per-component rounding can leave at most dim/2 quanta of projection
    assert(after.max <= 32L * 1000000L, s"max residual projection ${after.max}")
    assert(after.sum / after.size < before.sum / before.size / 100,
      "correction did not remove the dominant component")
  }

  test("isotropy diagnostic: along-axis variance collapses after ABTT") {
    val (_, df) = anisotropic
    val r = VectorOps.abttIsotropy(df).head
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Double]("axis_var_before") > 0)
    assert(r.getAs[Double]("residual_ratio") < 1e-4,
      s"residual_ratio ${r.getAs[Double]("residual_ratio")}")
  }
}
