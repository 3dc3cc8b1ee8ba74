package graft

import graft.timeseries.TimeSeriesOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck property tests for the TimeSeries algebra: random sparse
  * null-bearing series, checked through the real Spark plans. */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def runProp(p: Prop, cases: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  /** Sparse series on ts 0..24 with ~30% missing rows and ~25% nulls. */
  private val genObs: Gen[List[(Long, Option[Double])]] =
    Gen.sequence[List[Option[(Long, Option[Double])]], Option[(Long, Option[Double])]](
      (0L to 24L).map { t =>
        Gen.frequency(
          3 -> Gen.const(None),
          5 -> Gen.choose(0, 9999).map(v => Some(t -> Some(v / 100.0))),
          2 -> Gen.const(Some(t -> Option.empty[Double])))
      }.toList).map(_.flatten)

  private def df(obs: List[(Long, Option[Double])]): DataFrame =
    obs.toDF("ts", "value").select(col("ts"), col("value").cast("double"))

  private def rows(d: DataFrame): Seq[(Long, Option[Double])] =
    d.orderBy("ts").collect().toSeq.map(r =>
      (r.getLong(0), Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double])))

  test("property: mergeSum is commutative with null-preserving algebra") {
    runProp(Prop.forAll(genObs, genObs) { (a, b) =>
      a.nonEmpty && b.nonEmpty ==> {
        val ab = rows(mergeSum(df(a), df(b)))
        val ba = rows(mergeSum(df(b), df(a)))
        val aMap = a.toMap; val bMap = b.toMap
        val expected = (aMap.keySet ++ bMap.keySet).toSeq.sorted.map { t =>
          val (x, y) = (aMap.get(t).flatten, bMap.get(t).flatten)
          t -> ((x, y) match {
            case (None, None) => None
            case _ => Some(x.getOrElse(0.0) + y.getOrElse(0.0))
          })
        }
        ab == ba && ab == expected
      }
    })
  }

  test("property: interpolation is idempotent and null-free given any anchor") {
    runProp(Prop.forAll(genObs) { obs =>
      obs.exists(_._2.isDefined) ==> {
        val once = rows(interpolate(df(obs), Seq.empty))
        val twice = rows(interpolate(interpolate(df(obs), Seq.empty), Seq.empty))
        once == twice && once.forall(_._2.isDefined)
      }
    })
  }

  test("property: dense grid covers [min,max] exactly and preserves values") {
    runProp(Prop.forAll(genObs) { obs =>
      obs.nonEmpty ==> {
        val d = rows(dense(df(obs).withColumn("sid", lit("s")), step = 1L).drop("sid"))
        val ts = obs.map(_._1)
        val m = obs.toMap
        d.map(_._1) == (ts.min to ts.max) &&
          d.forall { case (t, v) => v == m.get(t).flatten }
      }
    })
  }
}
