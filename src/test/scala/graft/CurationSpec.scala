package graft

import graft.pipeline.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Invariant tests for the round-10 curation decision operators:
  * leakage-free splits, survivor selection, containment pairs, the
  * vocabulary coverage curve, temperature mixture weights, and the
  * measured LSH parameter planner.
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("leakproofSplit: no near-dup pair straddles a split boundary, and every doc is assigned") {
    val split = DedupOps.leakproofSplit(docs, 0.1, 0.05).persist()
    assert(split.count() === docs.count())
    assert(split.filter(!col("split").isin("train", "val", "test")).count() === 0L)
    // THE property: both ends of every verified near-dup pair share a split
    val pairs = DedupOps.minhashPairs(docs)
    val leaked = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    assert(leaked.count() === 0L)
    // and transitively: one split per component
    val nSplitsPerComp = split.groupBy("comp_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(nSplitsPerComp.count() === 0L)
    split.unpersist()
  }

  test("leakproofSplit: a by-document split on the same corpus DOES leak (the operator is not vacuous)") {
    val byDoc = TextOps.splitAssign(docs, 0.1, 0.05)
    val pairs = DedupOps.minhashPairs(docs)
    val leaked = pairs
      .join(byDoc.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(byDoc.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    // the sf0.001 fixture has planted near-dup clusters; a hash-by-doc
    // split scatters at least one of them across splits
    assert(leaked.count() > 0L)
  }

  test("substring-trim stage changes the downstream token bill: trimmed docs pack fewer BPE tokens") {
    import spark.implicits._
    // a corpus where one 8-token run repeats across docs: the flagship's
    // stage order (scrub → ExactSubstr trim → BPE bill → pack) must bill
    // the TRIMMED text, so the repeat's tokens vanish from the bill
    val run = (0 until 8).map(i => s"r$i").mkString(" ")
    val fx = Seq(
      (1L, s"$run a0 a1 a2 a3"),
      (2L, s"b0 b1 $run b2 b3"),  // the non-canonical copy: trimmed
      (3L, "c0 c1 c2 c3 c4 c5")
    ).toDF("doc_id", "text")
    val state = graft.pipeline.BpeFixture
      .learnedState(fx, "curation-substr-spec", nMerges = 20)._2
    def bill(frame: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      TextOps.bpeEncodeWith(frame, state)
        .select(col("doc_id"), col("bpe_tokens")).as[(Long, Long)]
        .collect().toMap
    val untrimmed = bill(fx)
    val trimmed = bill(TextOps.exactSubstringDedup(fx)
      .filter(col("clean_text") =!= "")
      .select(col("doc_id"), col("clean_text").as("text")))
    // stage order matters: doc 2's run leaves BEFORE billing
    assert(trimmed(2L) < untrimmed(2L),
      "the trimmed doc must pack fewer BPE tokens than its raw form")
    assert(trimmed(1L) === untrimmed(1L), "the canonical copy bills unchanged")
    assert(trimmed(3L) === untrimmed(3L), "untouched docs bill unchanged")
    // and the pack assignment sees the smaller bill: doc 2's trimmed
    // cumulative start shifts vs the untrimmed chain in its group
    def packs(bills: Map[Long, Long]) = TextOps.packByCounts(
        bills.toSeq.toDF("doc_id", "n_tokens"), budget = 8, groups = 1)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)]
      .collect().toMap
    assert(packs(trimmed)(3L) < packs(untrimmed)(3L),
      "a later doc lands in an earlier pack once the repeat is trimmed")
  }

  test("canonicalDocs: exactly one canonical per cluster, and it is the arg-max-quality member") {
    val can = DedupOps.canonicalDocs(docs).persist()
    val perComp = can.groupBy("comp_id").agg(
      sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canon"),
      max(col("quality")).as("max_q"))
    assert(perComp.filter(col("n_canon") =!= 1L).count() === 0L)
    // canonical quality equals the cluster max
    val canQ = can.filter(col("is_canonical"))
      .select(col("comp_id"), col("quality").as("cq"))
    assert(perComp.join(canQ, "comp_id").filter(col("cq") =!= col("max_q")).count() === 0L)
    // canonical_id is consistent: every member points at the canonical row
    val bad = can.as("m").join(
        can.filter(col("is_canonical")).select(col("comp_id"), col("doc_id").as("cid")),
        "comp_id")
      .filter(col("canonical_id") =!= col("cid"))
    assert(bad.count() === 0L)
    can.unpersist()
  }

  test("containmentPairs: a doc whose shingles are a subset of another's scores containment 1.0") {
    import spark.implicits._
    val contained = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb"))
      .toDF("doc_id", "text")
    val out = DedupOps.containmentPairs(contained, threshold = 0.6).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Double]("cont_a_in_b") === 1.0)
    assert(r.getAs[Double]("cont_b_in_a") < 1.0)
  }

  test("containmentPairs: symmetric-Jaccard threshold would reject what containment accepts") {
    import spark.implicits._
    val contained = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb " +
        "cc dd ee ff gg hh ii jj kk ll mm nn"))
      .toDF("doc_id", "text")
    // jaccard = 10/48 ≈ 0.21 < 0.5 — minhashPairs drops it...
    assert(DedupOps.minhashPairs(contained, threshold = 0.5).count() === 0L)
    // ...but the small doc is fully contained, and containment keeps it
    val out = DedupOps.containmentPairs(contained, threshold = 0.6).collect()
    assert(out.length === 1 && out.head.getAs[Double]("cont_a_in_b") === 1.0)
  }

  test("vocabCoverage: monotone in k, bounded by 1, and k=1 matches the top word's share") {
    val cov = TextOps.vocabCoverage(docs).orderBy("k").collect()
    assert(cov.nonEmpty)
    val covs = cov.map(_.getAs[Double]("coverage"))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    assert(covs.forall(c => c > 0.0 && c <= 1.0))
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val top = wc.orderBy(col("freq").desc, col("w")).limit(1)
      .collect().head.getAs[Long]("freq")
    val tot = wc.agg(sum("freq")).collect().head.getLong(0)
    assert(cov.head.getAs[Long]("k") === 1L)
    assert(cov.head.getAs[Double]("coverage") === top.toDouble / tot)
  }

  test("temperatureWeights: weights sum to ~1 and flatten the raw token shares") {
    val w = TextOps.temperatureWeights(docs).persist()
    val rows = w.collect()
    val sumW = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(sumW - 1.0) < 1e-4)
    // α = 1/2 compresses ratios: max/min of weights must not exceed the
    // raw share ratio (strictly less when shares differ)
    val tokens = rows.map(_.getAs[Long]("n_tokens").toDouble)
    val weights = rows.map(_.getAs[Double]("weight"))
    val rawRatio = tokens.max / tokens.min
    val wRatio = weights.max / weights.min
    assert(wRatio <= rawRatio + 1e-9)
    if (rawRatio > 1.001) assert(wRatio < rawRatio)
    // budget allocation never exceeds the budget
    assert(rows.map(_.getAs[Long]("budget_tokens")).sum <= 1000000L)
    w.unpersist()
  }

  test("lshPlanConfigs: S-curves are exact, monotone in similarity, and ordered by bands at low s") {
    val byCfg = DedupOps.lshPlanConfigs.groupBy(c => (c._1, c._2))
    // within a config, detection probability is non-decreasing in the bin
    byCfg.foreach { case (_, rows) =>
      val ps = rows.sortBy(_._3).map(_._4)
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-15 })
      assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    }
    // r = 1 (16 bands of 1 row) is the most permissive config at EVERY s;
    // r = 16 the strictest
    val p16_1 = byCfg((16, 1)).sortBy(_._3).map(_._4)
    val p1_16 = byCfg((1, 16)).sortBy(_._3).map(_._4)
    p16_1.zip(p1_16).foreach { case (hi, lo) => assert(hi >= lo) }
    // exactness spot check: b=1, r=1 is p = s itself at the midpoint —
    // wait, that config is absent; check b=16, r=1 against closed form
    val s0 = 1.0 / 20  // bin 0 midpoint
    assert(math.abs(p16_1.head - (1.0 - math.pow(1.0 - s0, 16))) < 1e-12)
  }

  test("lshPlan: recall rises with bands and FP mass falls with rows") {
    val plan = DedupOps.lshPlan(docs).collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_"),
        r.getAs[Double]("exp_fp"), r.getAs[Double]("est_recall"))).toSeq
    assert(plan.size === 5)
    val byBands = plan.sortBy(-_._1)
    // most bands (16,1) = best recall; fewest (1,16) = least FP
    assert(byBands.head._4 === plan.map(_._4).max)
    assert(byBands.last._3 === plan.map(_._3).min)
    plan.foreach { case (_, _, fp, rec) =>
      assert(fp >= 0.0); assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("extractHtml: recovers the wrapped text exactly, including decoded entities") {
    val ex = TextOps.extractHtml(TextOps.htmlInject(docs), col("atext"))
      .select(col("doc_id"), col("text"), col("clean_text"),
        col("markup_ratio"), col("n_tags"),
        pmod(col("doc_id"), lit(3L)).as("m3")).persist()
    // full-page and untouched docs: extraction returns the original text
    assert(ex.filter(col("m3") =!= 1 && col("clean_text") =!= col("text"))
      .count() === 0L)
    // inline-markup docs: original text + the decoded entity tail
    // (&amp; -> &, &lt;tags&gt; -> <tags>, &quot; -> ")
    val tail = " & more <tags> see also \"quoted\""
    assert(ex.filter(col("m3") === 1 &&
      col("clean_text") =!= concat(col("text"), lit(tail))).count() === 0L)
    // markup mass: positive exactly on the wrapped docs, zero otherwise
    assert(ex.filter(col("m3") =!= 2 && col("markup_ratio") <= 0.0).count() === 0L)
    assert(ex.filter(col("m3") === 2 &&
      (col("markup_ratio") =!= 0.0 || col("n_tags") =!= 0L)).count() === 0L)
    ex.unpersist()
  }

  test("extractBlocks: content kept; nav dies by link density, footer by boilerplate opener, stubs by length") {
    import spark.implicits._
    val long = "the quick brown fox jumps over the lazy dog again and again"
    val page = "<html><head><title>x</title><script>var a=1;</script></head><body>" +
      "<nav><a href=\"/\">Home</a> - <a href=\"/about\">About</a></nav>" +
      s"<div><p>$long</p></div>" +
      "<ul><li><a href=\"/1\">One link</a></li><li><a href=\"/2\">Two link</a></li></ul>" +
      "<footer>&copy; 2026 Example Corporation - All rights reserved " +
      "<a href=\"/tos\">Terms</a></footer></body></html>"
    val got = TextOps.extractBlocks(
        Seq((1L, page)).toDF("doc_id", "atext"), col("atext"))
      .select(col("n_blocks"), col("n_kept"), col("clean_text"))
      .collect().head
    // only the content paragraph survives: nav (link-saturated), the li
    // stubs (short), and the footer (long and link-light, but opens with
    // the decoded copyright marker) are all scored out
    assert(got.getString(2) === long)
    assert(got.getLong(1) === 1L)
    assert(got.getLong(0) >= 4L) // ...but they all COUNTED as blocks
    // a long paragraph with light linking is kept, anchor text inline
    val linky = s"<p>$long with a <a href=\"x\">single link</a> inside</p>"
    val g2 = TextOps.extractBlocks(
        Seq((2L, linky)).toDF("doc_id", "atext"), col("atext"))
      .select(col("clean_text")).collect().head.getString(0)
    assert(g2.startsWith(long) && g2.endsWith("single link inside"))
    // a link farm of comparable length dies by density alone
    val farm = "<p>" +
      (1 to 8).map(i => s"<a href=\"/$i\">link number $i</a>").mkString(" ") +
      "</p>"
    val g3 = TextOps.extractBlocks(
        Seq((3L, farm)).toDF("doc_id", "atext"), col("atext"))
      .select(col("n_kept")).collect().head.getLong(0)
    assert(g3 === 0L)
    // anchor-tag boundary: <abbr>/<address> text is CONTENT, not link
    // mass — a lazy "<a[^>]*>" would swallow the sentence up to the
    // first </a> and score the block out
    val abbr = s"<p>Contact our <abbr>HQ</abbr> office about $long " +
      "at <a href=\"/x\">go</a> now</p>"
    val g4 = TextOps.extractBlocks(
        Seq((4L, abbr)).toDF("doc_id", "atext"), col("atext"))
      .select(col("n_kept"), col("clean_text")).collect().head
    assert(g4.getLong(0) === 1L)
    assert(g4.getString(1).contains("HQ office"))
    // entity-symmetric density: the anchor mass is entity-decoded like
    // the block text, so &amp;-heavy anchors don't overcount
    val amp = "<p>" + ("&amp; " * 12) + "<a href=\"/y\">" +
      ("Fish &amp; Chips " * 3) + "</a></p>"
    val la = TextOps.extractBlocks(
        Seq((5L, amp)).toDF("doc_id", "atext"), col("atext"))
    // decoded anchor text is 38 chars ("Fish & Chips " x3, trimmed)
    // inside a 62-char block: 3*38 > 62 either way here, so assert the
    // SYMMETRY directly instead: block text and anchor text both decode
    val row = TextOps.extractBlocks(
        Seq((6L, "<p>" + ("pad " * 20) + "<a>A &amp; B</a></p>"))
          .toDF("doc_id", "atext"), col("atext"))
      .select(col("clean_text")).collect().head.getString(0)
    assert(row.endsWith("A & B")) // kept: 3*len("A & B")=15 <= len(text)
    assert(la.count() === 1L)
  }

  test("lineScrub: first occurrence survives, later duplicates vanish from the reconstruction") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z w"),  // both lines first occurrences
      (2L, "x y q r"),  // "x y" already seen in doc 1 -> scrubbed
      (3L, "s t s t"),  // intra-doc repeat: second "s t" scrubbed
      (4L, "x y")       // entirely seen -> empty reconstruction
    ).toDF("doc_id", "text")
    val got = TextOps.lineScrub(d, window = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_dup_lines"),
          r.getAs[Long]("kept_tokens"), r.getAs[String]("clean_text")))).toMap
    assert(got(1L) === ((2L, 0L, 4L, "x y z w")))
    assert(got(2L) === ((2L, 1L, 2L, "q r")))
    assert(got(3L) === ((2L, 1L, 2L, "s t")))
    assert(got(4L) === ((1L, 1L, 0L, "")))
  }

  test("urlCanonicalize: case, www, default ports, tracking params, ordering, fragments") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercased, www stripped, default port dropped,
      // tracking params dropped, survivors sorted, fragment dropped,
      // trailing slash stripped
      ("HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&a=1#f", "http://ex.com/a?a=1&b=2"),
      ("https://ex.com:443/a", "https://ex.com/a"),
      // explicit NON-default port survives
      ("https://ex.com:8080/a/", "https://ex.com:8080/a"),
      // root path: stripping the slash may not empty the path
      ("https://ex.com/", "https://ex.com/"),
      ("https://ex.com/p?utm_source=x&gclid=g1&fbclid=f&ref=h", "https://ex.com/p"),
      ("https://sub.www.ex.com/p", "https://sub.www.ex.com/p"),
      // repeated www prefixes strip to a fixed point in ONE pass — the
      // idempotence contract below must hold for hosts the fixture
      // never produces, not just the happy path
      ("https://www.WWW.ex.com/p", "https://ex.com/p"))
    val got = TextOps.urlCanonicalize(
        cases.map(_._1).toDF("url"), col("url"))
      .select(col("url"), col("canon_url")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(got(u) === want, s"for $u") }
  }

  test("urlCanonicalize is idempotent: the canonical form is its own fixed point") {
    // a second canonicalization pass over canon_url must be a no-op —
    // the property that lets crawl snapshots mix raw and pre-canonical
    // URLs in one dedup key space (checked over the whole fixture)
    val once = TextOps.urlCanonicalize(TextOps.urlInject(docs), col("url"))
      .select(col("doc_id"), col("canon_url"))
    val twice = TextOps.urlCanonicalize(
        once.withColumnRenamed("canon_url", "u"), col("u"))
      .select(col("doc_id"), col("u"), col("canon_url"))
    assert(twice.filter(col("canon_url") =!= col("u")).count() === 0L)
  }

  test("urlCanonicalDedup: one keeper per canonical URL, per-host cap holds") {
    val r = TextOps.urlCanonicalDedup(
      TextOps.urlInject(docs), col("url"), maxPerHost = 4).persist()
    assert(r.count() === docs.count())
    // exactly one non-dup row per canonical URL
    val perCanon = r.groupBy("canon_url")
      .agg(sum(when(col("is_url_dup"), 0L).otherwise(1L)).as("n_keepers"))
    assert(perCanon.filter(col("n_keepers") =!= 1L).count() === 0L)
    // kept rows: never dups, at most 4 per host, ranks within the cap
    assert(r.filter(col("keep") && col("is_url_dup")).count() === 0L)
    val perHost = r.filter(col("keep")).groupBy("host").agg(count(lit(1)).as("k"))
    assert(perHost.filter(col("k") > 4).count() === 0L)
    // dup rows report rank 0; kept ranks are 1..4
    assert(r.filter(col("is_url_dup") && col("host_rank") =!= 0L).count() === 0L)
    assert(r.filter(col("keep") &&
      (col("host_rank") < 1L || col("host_rank") > 4L)).count() === 0L)
    // the cap BITES on this fixture (hosts have > 4 canonical survivors)
    assert(r.filter(!col("is_url_dup") && !col("keep")).count() > 0L)
    r.unpersist()
  }

  test("urlBlocklistGate: host rules beat path rules, non-matching docs keep") {
    val g = TextOps.urlBlocklistGate(TextOps.urlInject(docs), col("url"),
      Seq("src3.example.com", "src7.example.com"), Seq("/articles/item1"))
      .persist()
    assert(g.count() === docs.count())
    // every blocked-host doc reports 'host' even when its path also matches
    assert(g.filter(col("host").isin("src3.example.com", "src7.example.com") &&
      col("block_reason") =!= "host").count() === 0L)
    // path blocks only fire on the prefix, on non-blocked hosts
    assert(g.filter(col("block_reason") === "path" &&
      !col("canon_path").startsWith("/articles/item1")).count() === 0L)
    // keep <=> no reason, and all three outcomes occur on the fixture
    assert(g.filter(col("keep") =!= col("block_reason").isNull).count() === 0L)
    assert(g.filter(col("block_reason") === "host").count() > 0L)
    assert(g.filter(col("block_reason") === "path").count() > 0L)
    assert(g.filter(col("keep")).count() > 0L)
    g.unpersist()
  }

  test("shardManifest: totals reconcile and a one-doc corruption moves exactly its shard's checksum") {
    val base = TextOps.shardManifest(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(base.size === 16)
    assert(base.values.map(_._1).sum === docs.count())
    assert(base.values.map(_._2).sum ===
      docs.select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0))
    // flip one document's content without changing its token count: the
    // manifest must expose EXACTLY that doc's shard, and only via the
    // checksum — the counts stay identical (silent-corruption shape)
    val victim = docs.agg(min("doc_id")).head.getLong(0)
    val corrupted = TextOps.shardManifest(
        docs.withColumn("text", when(col("doc_id") === victim,
          concat(col("text"), lit("X"))).otherwise(col("text")))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val moved = base.keySet.filter(s => base(s)._3 != corrupted(s)._3)
    assert(moved.size === 1)
    assert(base.forall { case (s, (nd, nt, _)) =>
      corrupted(s)._1 == nd && corrupted(s)._2 == nt })
  }

  test("web_pipeline funnel: stages partition the corpus and every gate fires") {
    val f = graft.queries.CurationQueries.queries("web_pipeline")(
      spark, "/root/testdata/sf0.001").persist()
    // each source's stage counts sum back to its raw count — every doc
    // is attributed to exactly ONE gate (or kept)
    assert(f.filter(col("n_raw") =!= col("n_url_blocked") + col("n_url_dup") +
      col("n_host_capped") + col("n_policy_blocked") + col("n_gopher_failed") +
      col("n_kept")).count() === 0L)
    val tot = f.agg(sum("n_raw"), sum("n_url_blocked"), sum("n_url_dup"),
      sum("n_host_capped"), sum("n_policy_blocked"), sum("n_gopher_failed"),
      sum("n_kept"), sum("tokens_kept")).head
    assert(tot.getLong(0) === docs.count())
    // non-vacuous: every gate drops something, survivors carry tokens
    (1 to 6).foreach(i => assert(tot.getLong(i) > 0L, s"stage $i vacuous"))
    assert(tot.getLong(7) > 0L)
    f.unpersist()
  }

  test("domainReweight: weight ordering follows loss ordering and the budget is respected") {
    val rw = TextOps.domainReweight(docs, col("source").isin("src0", "src1"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("loss_micro"),
        r.getAs[Long]("w_final"), r.getAs[Double]("weight"),
        r.getAs[Long]("budget_tokens")))
    assert(rw.length === 20)
    // the multiplicative update is monotone in the (fixed) loss: sorting
    // by loss and by final weight must agree
    val byLoss = rw.sortBy(r => (r._2, r._1)).map(_._1)
    val byW = rw.sortBy(r => (r._3, r._1)).map(_._1)
    assert(byLoss.toSeq === byW.toSeq)
    // the reference slice (zero OOV against itself) ends at minimum weight
    val minW = rw.map(_._3).min
    assert(rw.filter(r => r._1 == "src0" || r._1 == "src1")
      .forall(_._3 === minW))
    // weights form a distribution; budget never over-allocates
    val sumW = rw.map(_._4).sum
    assert(math.abs(sumW - 1.0) < 1e-3)
    assert(rw.map(_._5).sum <= 1000000L)
  }

  test("softDedupWeights: a cluster contributes one document's worth of weight; singletons keep 1.0") {
    import spark.implicits._
    val d = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // hand-built component closure: {1,2} clustered, 3 a singleton comp,
    // 4 and 5 never mined at all
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "comp_id")
    val got = DedupOps.softDedupWeights(d, sharedComps = Some(comps)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("comp_id"), r.getAs[Long]("dup_count"),
          r.getAs[Double]("soft_weight")))).toMap
    assert(got.size === 5)
    assert(got(1L) === ((1L, 2L, 0.5)))
    assert(got(2L) === ((1L, 2L, 0.5)))
    assert(got(3L) === ((3L, 1L, 1.0)))
    assert(got(4L) === ((4L, 1L, 1.0)))
    assert(got(5L) === ((5L, 1L, 1.0)))
    // and on the real corpus: every doc keeps a row, every component's
    // members sum to ~1.0 total weight (coverage preserved, pressure
    // removed), and clustered docs are strictly down-weighted
    val w = DedupOps.softDedupWeights(docs).persist()
    assert(w.count() === docs.count())
    val offComp = w.groupBy("comp_id").agg(sum("soft_weight").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-4)
    assert(offComp.count() === 0L)
    assert(w.filter(col("dup_count") > 1 && col("soft_weight") >= 1.0)
      .count() === 0L)
    w.unpersist()
  }

  test("spanScrub: repeated region trimmed to its k-1 boundary, first occurrence and short docs intact") {
    import spark.implicits._
    val rep = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, rep),                                          // first occurrence
      (2L, rep + " x1 x2 x3 x4 x5"),                      // repeat + fresh tail
      (3L, "p q")                                         // shorter than k
    ).toDF("doc_id", "text")
    val got = TextOps.spanScrub(d, k = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_text")))).toMap
    // doc 1 holds every keeper gram: untouched
    assert(got(1L) === ((10L, 0L, rep)))
    // doc 2: tokens w1..w6 are covered ONLY by dup grams -> dropped;
    // w7..w10 are covered by the first non-dup gram (w7..x1) -> the
    // conservative k-1 boundary survives with the fresh tail
    assert(got(2L) === ((15L, 6L, "w7 w8 w9 w10 x1 x2 x3 x4 x5")))
    // doc 3 has no 5-gram: passes through unchanged
    assert(got(3L) === ((2L, 0L, "p q")))
  }

  test("tfidfTerms: df-stopword cut is exact and the two-phase top-k equals the single-window answer") {
    import spark.implicits._
    val d = Seq(
      (1L, "A", "cat dog"), (2L, "A", "cat fish"), (3L, "B", "dog dog bird")
    ).toDF("doc_id", "source", "text")
    // N=3, df: cat 2, dog 2, fish 1, bird 1; at maxDfPct=50 only df=1
    // survives (2*100 > 3*50); score = tf * (4/2) = 2.0
    val got = TextOps.tfidfTerms(d, topK = 10, maxDfPct = 50).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Double]("score"), r.getAs[Long]("rk"))).toSet
    assert(got === Set(("A", "fish", 1L, 1L, 2.0, 1L),
      ("B", "bird", 1L, 1L, 2.0, 1L)))
    // fanout=1 makes phase 1 THE per-source window — the bucketed
    // two-phase must reproduce it exactly on the real corpus
    val fast = TextOps.tfidfTerms(docs, maxDfPct = 79)
    val ref = TextOps.tfidfTerms(docs, fanout = 1, maxDfPct = 79)
    assert(fast.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(fast).count() === 0L)
    assert(fast.count() > 0L)
  }

  test("incremental_refresh: one fate per delta doc, internally consistent") {
    val out = CacheScope.scoped {
      graft.SparkEntry.queries("incremental_refresh")(
        spark, "/root/testdata/sf0.001").persist()
    }
    // every row is a non-unchanged snapshot-diff doc, exactly once
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0L)
    assert(out.filter(!col("status").isin("added", "changed", "removed"))
      .count() === 0L)
    // fate ⇄ evidence consistency
    assert(out.filter(col("action") === "evicted")
      .filter(col("status") =!= "removed" || col("p_keep").isNotNull ||
        col("cid").isNotNull).count() === 0L)
    assert(out.filter(col("action") === "indexed")
      .filter(col("cid").isNull || col("n_dup_hits") =!= 0L ||
        !col("p_keep") || !col("g_keep")).count() === 0L)
    assert(out.filter(col("action") === "near_dup")
      .filter(col("dup_of").isNull || col("n_dup_hits") < 1L ||
        col("cid").isNotNull).count() === 0L)
    assert(out.filter(col("action") === "gated")
      .filter(col("cid").isNotNull || col("n_dup_hits").isNotNull).count() === 0L)
    // the fixture exercises the interesting fates
    val acts = out.select("action").distinct().collect().map(_.getString(0)).toSet
    assert(acts.contains("evicted") && acts.contains("indexed"),
      s"fixture should produce evictions and fresh indexing, got $acts")
    out.unpersist()
  }
}
