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

  // ---------------------------------------- LLM-pipeline op invariants --

  /** Random small corpora: doc_id → 1..40 single-char tokens. */
  private val genDocs: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.sequence[List[(Long, String)], (Long, String)]((0 until n).map { i =>
        Gen.chooseNum(1, 40).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
            .map(ts => (i.toLong, ts.mkString(" "))))
      }.toList))

  private def docsDf(docs: List[(Long, String)]) = docs.toDF("doc_id", "text")

  test("property: packing covers every doc once; packs respect the budget; " +
       "assignments are stable under corpus growth") {
    import graft.pipeline.TextOps
    runProp(Prop.forAll(genDocs) { docs =>
      docs.nonEmpty ==> {
        val budget = 16
        val asg = TextOps.packAssignments(docsDf(docs), budget, groups = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getBoolean(4)))
        val byDoc = asg.map(a => a._2 -> a).toMap
        // every doc exactly once
        val coversAll = asg.length == docs.length &&
          docs.forall(d => byDoc.contains(d._1))
        // concatenate-and-cut semantics: within a (grp, pack), the
        // non-straddling token mass fits the budget
        val fits = asg.groupBy(a => (a._1, a._4)).forall { case (_, as) =>
          as.filter(!_._5).map(_._3).sum <= budget }
        // growth stability: appending higher-id docs never moves an
        // existing assignment
        val grown = docs ++ docs.map { case (id, t) => (id + docs.length, t) }
        val asg2 = TextOps.packAssignments(docsDf(grown), budget, groups = 4)
          .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(3))).toMap
        val stable = asg.forall(a => asg2(a._2) == ((a._1, a._4)))
        coversAll && fits && stable
      }
    }, cases = 6)
  }

  test("property: split assignment is growth-stable and content-independent") {
    import graft.pipeline.TextOps
    runProp(Prop.forAll(genDocs) { docs =>
      docs.nonEmpty ==> {
        val a = TextOps.splitAssign(docsDf(docs), 0.2, 0.1).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        // growing the corpus never reassigns an existing doc
        val grown = docs ++ docs.map { case (id, t) => (id + docs.length, t) }
        val b = TextOps.splitAssign(docsDf(grown), 0.2, 0.1).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        // editing content never changes the split (id-keyed draw)
        val edited = docs.map { case (id, _) => (id, "x") }
        val c = TextOps.splitAssign(docsDf(edited), 0.2, 0.1).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        a.forall { case (id, s) => b(id) == s && c(id) == s } &&
          a.values.forall(Set("train", "val", "test"))
      }
    }, cases = 6)
  }

  test("property: native shingle_min_hash == Column-DSL fingerprint " +
    "(unicode, short and empty strings; interpreted and codegen paths)") {
    import graft.pipeline.TextOps
    val genText: Gen[String] = Gen.frequency(
      1 -> Gen.const(""),
      2 -> Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
      4 -> Gen.choose(7, 60).flatMap(n => Gen.stringOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))),
      2 -> Gen.choose(1, 30).flatMap(n => Gen.stringOfN(n,
        Gen.frequency(3 -> Gen.alphaNumChar,
          2 -> Gen.oneOf('的', 'é', 'は', 'ß', '中')))))
    runProp(Prop.forAll(Gen.listOfN(40, genText)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val dsl = TextOps.fingerprints(docs)
        .select(col("doc_id"), col("fp_shingle_min")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val native = TextOps.fingerprintsNative(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // and the interpreted (non-codegen) eval path of the expression
      val interp = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> graft.functions.ShingleMinHash.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
      }.toMap
      dsl == native && dsl == interp
    }, cases = 8)
  }
}
