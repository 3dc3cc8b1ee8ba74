package graft

import graft.models.Isotonic
import graft.pipeline.EventOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** The relational minimax isotonic fit vs the classic sequential
  * pool-adjacent-violators algorithm, plus the interval-join operator's
  * equivalence to a naive theta join. */
class IsotonicSpec extends SparkSpec {

  private def runProp(p: Prop, cases: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  /** Textbook PAV: pool adjacent violating blocks left-to-right until
    * monotone; block value = pooled mean. Exact rational arithmetic via
    * (num, den) longs so the reference is bit-honest. */
  private def pavReference(bins: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    // bins: (score, n, n_pos) sorted by score
    case class Block(scores: List[Long], n: Long, y: Long) {
      def mean: Double = y.toDouble / n.toDouble
    }
    val stack = scala.collection.mutable.Stack.empty[Block]
    bins.sortBy(_._1).foreach { case (s, n, y) =>
      var b = Block(List(s), n, y)
      // merge while the new block violates monotonicity vs the top:
      // compare pooled means exactly by cross-multiplication
      while (stack.nonEmpty && stack.top.y * b.n >= b.y * stack.top.n) {
        val t = stack.pop()
        b = Block(t.scores ++ b.scores, t.n + b.n, t.y + b.y)
      }
      stack.push(b)
    }
    stack.toList.flatMap(b => b.scores.map(_ -> b.mean)).toMap
  }

  private val binsGen: Gen[List[(Long, Long, Long)]] = for {
    nBins <- Gen.choose(1, 8)
    scores <- Gen.pick(nBins, 0L to 12L)
    rows <- Gen.listOfN(nBins, for {
      n <- Gen.choose(1L, 9L)
      y <- Gen.choose(0L, 9L)
    } yield (n, math.min(n, y)))
  } yield scores.toList.sorted.zip(rows).map { case (s, (n, y)) => (s, n, y) }

  test("relational minimax == sequential PAV on random binned data") {
    import spark.implicits._
    runProp(Prop.forAll(binsGen) { bins =>
      bins.nonEmpty ==> {
        val rows = bins.flatMap { case (s, n, y) =>
          Seq.fill(y.toInt)((s, 1L)) ++ Seq.fill((n - y).toInt)((s, 0L))
        }
        val got = Isotonic.calibrate(rows.toDF("score", "y"))
          .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
        val want = pavReference(bins)
        got.keySet == want.keySet &&
          got.forall { case (s, p) => math.abs(p - want(s)) < 1e-6 }
      }
    })
  }

  test("calibration is monotone, in [0,1], and preserves the pooled mean") {
    import spark.implicits._
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val scored = graft.pipeline.TextOps.langId(all)
      .select(col("doc_id"), col("s_en").cast("long").as("score"))
      .join(all.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
      .select("score", "y")
    val fit = Isotonic.calibrate(scored)
      .orderBy("score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fit.nonEmpty)
    fit.sliding(2).foreach {
      case Array((_, _, _, p1), (_, _, _, p2)) => assert(p1 <= p2 + 1e-12)
      case _ => ()
    }
    fit.foreach { case (_, _, _, p) => assert(p >= 0.0 && p <= 1.0 + 1e-9) }
    // Σ n·p == Σ y (isotonic regression preserves block totals)
    val lhs = fit.map { case (_, n, _, p) => n * p }.sum
    val rhs = fit.map { case (_, _, y, _) => y.toDouble }.sum
    assert(math.abs(lhs - rhs) < 1e-3, s"$lhs vs $rhs")
  }

  test("bucketized interval join == naive theta join, zero-match intervals kept") {
    import spark.implicits._
    val intervals = Seq(
      (1L, 100L, 250L),   // spans 2 buckets at width 100
      (2L, 260L, 260L),   // point interval
      (3L, 900L, 1200L),  // empty: no probe rows inside
      (4L, 0L, 999L)      // wide interval spanning many buckets
    ).toDF("win_id", "lo", "hi")
    val probe = Seq(0L, 99L, 100L, 250L, 251L, 260L, 500L, 889L, 1300L)
      .toDF("ts")
    val got = EventOps.intervalCount(intervals, probe, bucket = 100L,
        idCols = Seq("win_id"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // naive truth
    val iv = Seq((1L, 100L, 250L), (2L, 260L, 260L), (3L, 900L, 1200L), (4L, 0L, 999L))
    val ts = Seq(0L, 99L, 100L, 250L, 251L, 260L, 500L, 889L, 1300L)
    val want = iv.map { case (id, lo, hi) =>
      id -> ts.count(t => t >= lo && t <= hi).toLong }.toMap
    assert(got == want)
    assert(got(3L) == 0L) // left semantics: kept with zero
  }
}
