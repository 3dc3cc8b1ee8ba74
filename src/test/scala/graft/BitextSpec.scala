package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.functions._

/** Bitext mining with the Artetxe-Schwenk ratio margin: the property
  * that justifies the margin over a plain cosine threshold — a HUB
  * vector (moderately close to every source doc) outranks the true
  * counterpart on raw cosine but loses on margin, because its own k-NN
  * denominator is inflated by exactly the closeness that made it win.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  // langA: two near-orthogonal docs. langB: one true counterpart per A
  // doc (cos 0.70 to its partner, ~0 to the other) and one hub sitting
  // at cos 0.75 / 0.66 to BOTH A docs.
  private lazy val emb = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),              // a1
    (2L, Seq(0f, 1f, 0f, 0f)),              // a2
    (10L, Seq(0.70f, 0f, 0.714f, 0f)),      // t1: cos(a1)=0.70
    (11L, Seq(0f, 0.70f, 0f, 0.714f)),      // t2: cos(a2)=0.70
    (12L, Seq(0.75f, 0.6614f, 0f, 0f))      // hub: cos(a1)=0.75, cos(a2)=0.66
  ).toDF("vec_id", "embedding")

  private lazy val langs = Seq(
    (1L, "en"), (2L, "en"), (10L, "de"), (11L, "de"), (12L, "de")
  ).toDF("doc_id", "lang")

  test("the margin demotes the hub that raw cosine mines as a false pair") {
    val got = VectorOps.bitextMarginPairs(emb, langs, "en", "de",
        k = 2, threshold = 0.0, banded = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // raw cosine would pick the hub (0.75 > 0.70) for a1 — the margin
    // must pick the true counterpart for BOTH sources
    assert(got === Map(1L -> 10L, 2L -> 11L), s"mined $got")
  }

  test("mutual intersection is a subset of one-best and requires agreement") {
    val oneBest = VectorOps.bitextMarginPairs(emb, langs, "en", "de",
      k = 2, threshold = 0.0, banded = false).collect().map(_.toSeq).toSet
    val mutual = VectorOps.bitextMutualPairs(emb, langs, "en", "de",
      k = 2, threshold = 0.0, banded = false).collect().map(_.toSeq).toSet
    assert(mutual.subsetOf(oneBest))
    // on this fixture both true pairs agree in both directions (the hub
    // is nobody's mutual best), so the intersection keeps exactly them
    assert(mutual.map(r => (r.head, r(1))) === Set((1L, 10L), (2L, 11L)))
  }

  test("mining is deterministic and one-best-per-source") {
    val r1 = VectorOps.bitextMarginPairs(emb, langs, "en", "de",
      k = 2, threshold = 0.0, banded = false).collect().map(_.toSeq).toSet
    val r2 = VectorOps.bitextMarginPairs(emb, langs, "en", "de",
      k = 2, threshold = 0.0, banded = false).collect().map(_.toSeq).toSet
    assert(r1 == r2)
    assert(r1.groupBy(_.head).forall(_._2.size == 1))
  }

  test("banded production mode: a cross-language subset, deterministic, one per source") {
    // the real corpus: banded candidates bite there (non-empty pinned on
    // the sf0.001 table — the fixture above is too small/adversarial
    // for sign bands)
    val docsT = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r1 = VectorOps.bitextMarginPairs(embT, docsT)
      .collect().map(_.toSeq).toSet
    val r2 = VectorOps.bitextMarginPairs(embT, docsT)
      .collect().map(_.toSeq).toSet
    assert(r1 == r2)
    assert(r1.nonEmpty, "banded candidates must bite on the real corpus")
    assert(r1.groupBy(_.head).forall(_._2.size == 1))
  }

  test("cells candidate mode: deterministic, one per source, and it presents " +
    "pairs the bands miss on the weakly-clustered corpus") {
    val docsT = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r1 = VectorOps.bitextMarginPairs(embT, docsT,
      candidates = Some("cells")).collect().map(_.toSeq).toSet
    val r2 = VectorOps.bitextMarginPairs(embT, docsT,
      candidates = Some("cells")).collect().map(_.toSeq).toSet
    assert(r1 == r2)
    assert(r1.nonEmpty, "cell candidates must bite on the real corpus")
    assert(r1.groupBy(_.head).forall(_._2.size == 1))
    // the reason the mode exists: on this corpus the cells-mode recall
    // leg strictly beats the banded one (0.51 vs 0.10 at sf0.01 —
    // SCALE.md r16; here just pin the ordering so a regression shows)
    def rec(df: org.apache.spark.sql.DataFrame) =
      df.select(col("recall")).head.getDouble(0)
    val cellRec = rec(VectorOps.bitextCellRecall(embT, docsT))
    val bandRec = rec(VectorOps.bitextBandedRecall(embT, docsT))
    assert(cellRec >= bandRec,
      s"cells recall ($cellRec) must not trail banded ($bandRec) here")
  }

  test("bitextAuto mines exactly what the router picked, on both corpus shapes") {
    def directOf(e: org.apache.spark.sql.DataFrame,
                 l: org.apache.spark.sql.DataFrame,
                 k: Int, threshold: Double): Set[Seq[Any]] = {
      val d = VectorOps.bitextModeDiagnostic(e, l, "en", "de", k, threshold)
      val rows = d.collect()
      assert(rows.length == 2 && rows.count(_.getBoolean(5)) == 1,
        s"router must emit 2 mode rows with one pick, got ${rows.toSeq}")
      val mode = rows.find(_.getBoolean(5)).get.getString(0)
      VectorOps.bitextMarginPairs(e, l, "en", "de", k, threshold,
          candidates = Some(mode))
        .withColumn("mode", lit(mode))
        .collect().map(_.toSeq).toSet
    }
    // the adversarial hub fixture (strong cross-language structure)
    val autoF = VectorOps.bitextAutoPairs(emb, langs, "en", "de",
      k = 2, threshold = 0.0).collect().map(_.toSeq).toSet
    assert(autoF === directOf(emb, langs, 2, 0.0))
    // the weakly-clustered real corpus — where the router's evidence
    // (cells 0.51 vs banded 0.10) must drive the pick to cells
    val docsT = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val autoT = VectorOps.bitextAutoPairs(embT, docsT)
      .collect().map(_.toSeq).toSet
    assert(autoT.nonEmpty)
    assert(autoT === directOf(embT, docsT,
      VectorOps.BitextNnK, VectorOps.BitextMarginThreshold))
  }
}
