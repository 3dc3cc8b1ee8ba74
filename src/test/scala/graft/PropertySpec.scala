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

  test("property: packing never wastes more slots than padding") {
    import graft.pipeline.TextOps
    runProp(Prop.forAll(genDocs) { docs =>
      docs.nonEmpty ==> {
        val budget = 16
        val r = TextOps.packEfficiency(docsDf(docs), budget, groups = 4).head
        val (nDocs, total, slots, packs) = (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))
        val (padU, pakU) = (r.getDouble(4), r.getDouble(5))
        // packs of concatenated streams can never exceed per-doc padded
        // slots, and both bills must cover the token mass
        nDocs == docs.length &&
          packs <= slots &&
          total <= packs * budget && total <= slots * budget &&
          pakU >= padU - 1e-9 && pakU <= 1.0 + 1e-9
      }
    }, cases = 6)
  }

  test("property: chunking covers every token; boundaries are pure arithmetic") {
    import graft.pipeline.TextOps
    val (window, stride) = (8, 6)
    runProp(Prop.forAll(genDocs) { docs =>
      docs.nonEmpty ==> {
        val chunks = TextOps.chunkDocs(docsDf(docs), window, stride)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getString(4)))
        docs.forall { case (id, text) =>
          val toks = text.split(" ")
          val mine = chunks.filter(_._1 == id).sortBy(_._2)
          val nc = if (toks.length <= window) 1
                   else (toks.length - window + stride - 1) / stride + 1
          mine.length == nc &&
            mine.zipWithIndex.forall { case ((_, cid, start, n, txt), i) =>
              cid == i && start == i.toLong * stride + 1 &&
                txt == toks.slice(i * stride, i * stride + window).mkString(" ") &&
                n == toks.slice(i * stride, i * stride + window).length
            } &&
            // coverage: the union of [start, start+n) is [1, len]
            mine.flatMap { case (_, _, s, n, _) => s until (s + n) }
              .toSet == (1L to toks.length).toSet
        }
      }
    }, cases = 6)
  }

  test("piiScrub: counts and redaction order on crafted text") {
    import graft.pipeline.TextOps
    val df = Seq(
      (1L, "mail a@b.com and c.d@e.org ip 192.168.0.1 tel +1-555-1234 end"),
      (2L, "plain text, no pii at all"),
      (3L, "versions 1.2.3.4 and 10.0.0.255")).toDF("doc_id", "text")
    val got = TextOps.piiScrub(df, col("text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> end")))
    assert(got(1) == ((2L, 0L, 0L, 0L, "plain text, no pii at all")))
    // dotted version quads match the IP pattern by design (documented:
    // the pattern is purely syntactic, 0-255 range checks are a later
    // semantic pass)
    assert(got(2) == ((3L, 0L, 2L, 0L, "versions <IP> and <IP>")))
  }

  test("kmvDistinct: exact below k, sane estimate above k") {
    import graft.pipeline.TextOps
    // small: 3 distinct tokens -> exact path
    val small = Seq((1L, "small", "x y z"), (2L, "small", "x y"))
      .map { case (id, src, t) => (id, src, t) }
      .toDF("doc_id", "source", "text")
    // big: 500 distinct tokens across docs -> sketch path (k = 64)
    val big = (0 until 50).map(i =>
      (100L + i, "big", (0 until 10).map(j => s"tok_${i * 10 + j}").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = TextOps.kmvDistinct(small.unionByName(big), k = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("small") == ((3L, 3.0)))
    val (nBig, estBig) = got("big")
    assert(nBig == 500L)
    // KMV with k=64 has ~12% std error; 2x is a generous sanity band
    assert(estBig > 250.0 && estBig < 1000.0, s"estimate $estBig off for 500")
  }

  test("bm25: term-bearing docs outrank term-free docs; tf monotonicity") {
    import graft.pipeline.TextOps
    val df = Seq(
      (1L, "query query query pad pad pad"),
      (2L, "query pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad"),
      (4L, "join pad pad pad pad pad")).toDF("doc_id", "text")
    val got = TextOps.bm25(df, Seq("query", "join"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1) > got(2), "higher tf must score higher")
    assert(got(2) > got(3) && got(4) > got(3), "any hit beats no hit")
    assert(got(3) == 0.0, "no query term -> zero score")
  }

  test("phraseSearch: positional intersection finds exactly the literal matches, snippets clip at edges") {
    import graft.pipeline.TextOps
    val df = Seq(
      (1L, "a b c a b"),   // "b c" at 2; "a b" at 1 and 4
      (2L, "b c a"),       // "b c" at 1
      (3L, "x y"),         // no phrase terms at all
      (4L, "a b a b a")    // overlapping repeated-term matches
    ).toDF("doc_id", "text")
    val bc = TextOps.phraseSearch(df, Seq("b", "c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // ctx=2: snippets clip at both document edges
    assert(bc === Set((1L, 2L, "a b c a b"), (2L, 1L, "b c a")))
    // a repeated term in the phrase constrains BOTH its offsets
    val aba = TextOps.phraseSearch(df, Seq("a", "b", "a")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aba === Set((4L, 1L), (4L, 3L)))
    // a phrase with an absent term matches nothing
    assert(TextOps.phraseSearch(df, Seq("a", "zz")).count() === 0L)
  }

  test("charLmScore: repetitive docs score high, anomalous chars score low") {
    import graft.pipeline.TextOps
    val df = Seq(
      (1L, "abababababababab"),   // transitions the corpus knows well
      (2L, "abababab"),
      (3L, "abq")                  // 'bq'/'q?' transitions are rare
    ).toDF("doc_id", "text")
    val rows = TextOps.charLmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows(1)._1 == 15L && rows(3)._1 == 2L)
    assert(rows(1)._2 > rows(3)._2, "anomalous doc must score lower")
    // p(b|a) for the dominant a->b transition is near 1; min_p for doc 3
    // reflects the rare bq transition
    assert(rows(3)._3 < rows(1)._3)
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

  test("property: asofJoin == per-row brute-force scan (random keys/ts, ties)") {
    import graft.pipeline.EventOps
    val genLeft = Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c"); t <- Gen.choose(0L, 40L)
    } yield (k, t))
    val genRight = Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c"); t <- Gen.choose(0L, 40L)
      v <- Gen.choose(0, 999)
    } yield (k, t, v / 10.0))
    runProp(Prop.forAll(genLeft, genRight) { (l, r0) =>
      // unique ts per key on the right (the operator's contract)
      val r = r0.groupBy(x => (x._1, x._2)).map(_._2.head).toList
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "sid", "ts")
      val right = r.toDF("sid", "ts", "value")
      val got = EventOps.asofJoin(left, right, "sid").collect().map(x =>
        (x.getLong(x.fieldIndex("event_id")),
          Option(x.get(x.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
          Option(x.get(x.fieldIndex("asof_value"))).map(_.asInstanceOf[Double])))
        .sortBy(_._1).toSeq
      val want = l.zipWithIndex.map { case ((k, t), i) =>
        val cand = r.filter(x => x._1 == k && x._2 <= t)
        if (cand.isEmpty) (i.toLong, None, None)
        else { val m = cand.maxBy(_._2); (i.toLong, Some(m._2), Some(m._3)) }
      }.sortBy(_._1).toSeq
      got == want
    }, cases = 8)
  }

  test("property: connectedComponents == driver union-find on random graphs") {
    import graft.pipeline.GraphOps
    val genEdges = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (a, b)))
    runProp(Prop.forAll(genEdges) { es =>
      es.nonEmpty ==> {
        // driverMaxEdges = 0: exercise the DISTRIBUTED propagation path
        // against the driver-side union-find reference below (the driver
        // path IS that union-find, so testing it here would be circular)
        val got = GraphOps.connectedComponents(es.toDF("src", "dst"),
          driverMaxEdges = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver-side union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min node id of the component
        val want = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
        got == want
      }
    }, cases = 8)
  }

  test("property: sessionize partitions events; splits exactly at gaps > g") {
    import graft.pipeline.EventOps
    val genEv = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 300L)
    } yield (u, t, 1.0)))
    runProp(Prop.forAll(genEv, Gen.oneOf(10L, 50L)) { (ev, gap) =>
      ev.nonEmpty ==> {
        val sessions = EventOps.sessionize(ev.toDF("user_id", "ts", "value"), gap)
          .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("session_start")),
            r.getLong(r.fieldIndex("session_end")), r.getLong(r.fieldIndex("n_events"))))
        // per user: sessions tile the sorted distinct gap-split segments
        ev.groupBy(_._1).forall { case (u, rows) =>
          val ts = rows.map(_._2).sorted
          val splits = ts.zip(ts.drop(1)).count { case (a, b) => b - a > gap }
          val mine = sessions.filter(_._1 == u)
          mine.length == splits + 1 &&
            mine.map(_._4).sum == rows.length && // every event in exactly one session
            mine.sortBy(_._2).sliding(2).forall { // consecutive sessions > gap apart
              case Array(x, y) => y._2 - x._3 > gap
              case _ => true
            }
        }
      }
    }, cases = 8)
  }
}
