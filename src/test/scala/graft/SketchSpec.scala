package graft

import graft.pipeline.{DedupOps, EventOps, SketchOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-7 operator invariants: Bloom-filter prune (zero false
  * negatives — the property that makes it a safe semi-join substitute),
  * HyperLogLog error bounds, Mann–Whitney AUC on separable/random toys,
  * adaptive quality-cut fractions, MAD outlier robustness, and fuzzy
  * Levenshtein pair symmetry with its banding contract. */
class SketchSpec extends SparkSpec {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("bloomPrune never produces a false negative, and flags every true member") {
    val keys = docs.filter(col("lang") === "de")
    val out = SketchOps.bloomPrune(docs, keys, "doc_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, bloom) = (r.getAs[Int]("exact_member"), r.getAs[Int]("bloom_member"))
      assert(bloom >= exact, s"false negative at doc ${r.get(0)}")
    }
    val nKeys = keys.count()
    assert(out.count(_.getAs[Int]("exact_member") == 1) == nKeys)
  }

  test("bloomPrune false-positive rate stays near the (1-e^(-kn/m))^k design point") {
    val keys = docs.filter(col("lang") === "de")
    val out = SketchOps.bloomPrune(docs, keys, "doc_id", k = 3, m = 4096).collect()
    val nonMembers = out.filter(_.getAs[Int]("exact_member") == 0)
    val fp = nonMembers.count(_.getAs[Int]("bloom_member") == 1)
    val n = keys.count().toDouble
    val expected = math.pow(1 - math.exp(-3 * n / 4096), 3)
    // generous envelope: observed FPR within 5x of theory + 2% absolute
    assert(fp.toDouble / nonMembers.length <= expected * 5 + 0.02,
      s"fp=$fp of ${nonMembers.length}, theory=$expected")
  }

  test("hllDistinct estimates within the 3-sigma envelope of 1.04/sqrt(m)") {
    val out = SketchOps.hllDistinct(docs, p = 8).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val err = math.abs(r.getAs[Double]("rel_err"))
      assert(err < 3 * 1.04 / math.sqrt(256) + 0.02,
        s"source ${r.get(0)}: rel_err $err")
    }
  }

  test("HLL registers merge by MAX: sharded maxes equal the whole-corpus registers") {
    // the 100 TB contract: per-day/per-partition register frames compose
    // into the global sketch with one MAX groupBy, no token re-scan
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val merged = SketchOps.hllRegisters(half1, 8)
      .union(SketchOps.hllRegisters(half2, 8))
      .groupBy(col("source"), col("r")).agg(max(col("mr")).as("mr"))
    val whole = SketchOps.hllRegisters(docs, 8)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("qualityAuc is 1.0 for a perfectly separating score and ~0.5 for a constant one") {
    import spark.implicits._
    // perfectly separable: every en doc longer (higher quality) than non-en
    val sep = (1 to 20).map { i =>
      val en = i % 2 == 0
      val text = if (en) ("the and of to " * (i + 20)).trim else "zz yy"
      (i.toLong, text, if (en) "en" else "zz", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val auc = TextOps.qualityAuc(sep).collect().head.getAs[Double]("auc")
    // en docs here score LOWER (stopword-heavy) — perfect anti-separation
    // is AUC 0 or 1 depending on direction; assert extreme, not middle
    assert(auc <= 0.05 || auc >= 0.95, s"separable corpus gave auc=$auc")
    // constant score: every rank tied, AUC must be exactly 0.5
    val const = (1 to 20).map { i =>
      (i.toLong, "same text here", if (i % 2 == 0) "en" else "zz", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val auc2 = TextOps.qualityAuc(const).collect().head.getAs[Double]("auc")
    assert(math.abs(auc2 - 0.5) < 1e-9, s"tied corpus gave auc=$auc2")
  }

  test("adaptiveQualityFilter keeps exactly ceil(n/10) docs per source") {
    val kept = TextOps.adaptiveQualityFilter(docs)
      .groupBy(col("source")).agg(count(lit(1)).as("k"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    kept.join(totals, "source").collect().foreach { r =>
      val (k, n) = (r.getAs[Long]("k"), r.getAs[Long]("n"))
      assert(k == (n + 9) / 10, s"source ${r.get(0)}: kept $k of $n")
    }
  }

  test("madOutliers flags a planted extreme value and nothing in a tight cluster") {
    import spark.implicits._
    val base = (1 to 50).map(i => ("t", i.toLong, 100.0 + (i % 5))) :+ (("t", 99L, 1e6))
    val out = EventOps.madOutliers(
      base.toDF("event_type", "event_id", "value")).collect()
    assert(out.length == 1 && out.head.getAs[Long]("event_id") == 99L,
      s"got ${out.mkString(",")}")
  }

  test("fuzzyPairs finds banded near-identical titles at distance <= tolerance") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = Seq(
      (1L, t1, "en", "s"),
      (2L, t1 + " nu", "en", "s"),       // same shingles mostly, tiny edit
      (3L, "completely different words entirely unrelated content here now", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = DedupOps.fuzzyPairs(d, prefixLen = 80, maxDist = 25).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("hllUserWindows: exact column is truth, estimate tracks it per window") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = graft.pipeline.SketchOps.hllUserWindows(events, p = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val truth = events.select(
        expr("unix_timestamp(ts) div 3600 * 3600").as("w"), col("user_id"))
      .distinct().groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (w, exact, est, rel) =>
      assert(exact == truth(w), s"window $w exact $exact != ${truth(w)}")
      // p=8 HLL: ~6.5% stderr; 4x that as a hard per-window bound
      assert(math.abs(rel) < 0.26, s"window $w rel_err $rel")
      assert(math.abs(est - exact) <= math.max(3.0, 0.26 * exact))
    }
  }
}
