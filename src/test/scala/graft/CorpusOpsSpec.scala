package graft

import graft.pipeline.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Invariant tests for the round-6 corpus operators: line-level dedup,
  * repeated-substring spans, DSIR importance weights, the length-quantile
  * sketch, shard assignment, and SemDeDup — each checked against
  * from-first-principles recomputations on the sf0.001 fixtures.
  */
class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("lineDedup: line accounting is exact and exactly one occurrence per hash survives") {
    val out = TextOps.lineDedup(docs, window = 10)
    val base = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val joined = out.join(base, "doc_id")
    // ceil(n/10) lines per doc, none lost
    assert(joined.filter(col("n_lines") =!= expr("greatest((n + 9) div 10, 1)")).count() === 0L)
    // kept fraction consistent: dup lines counted once in the fraction
    assert(out.filter(col("dup_line_frac") =!=
      round(col("n_dup_lines").cast("double") / col("n_lines") + lit(1e-9), 4)).count() === 0L)
    // global invariant: total kept lines == distinct line hashes
    val totKept = out.agg(sum(col("n_lines") - col("n_dup_lines"))).head.getLong(0)
    val distinctHashes = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .select(posexplode(sequence(lit(0L),
        greatest(expr("(n + 9) div 10"), lit(1L)) - 1)).as(Seq("pos", "l")), col("ts"))
      .select(md5(array_join(slice(col("ts"), (col("l") * 10 + 1).cast("int"), lit(10)), " ")).as("h"))
      .distinct().count()
    assert(totKept === distinctHashes)
  }

  test("repeatedSpans: spans are in-bounds, disjoint, and genuinely repeated") {
    val spans = TextOps.repeatedSpans(docs, k = 5).collect()
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spans.nonEmpty, "synthetic corpus should contain repeated 5-grams")
    spans.groupBy(_.getLong(0)).foreach { case (doc, ss) =>
      val ranges = ss.map(r => (r.getLong(1), r.getLong(1) + r.getLong(2) - 1)).sortBy(_._1)
      // gram-position ranges disjoint with at least one gap between spans
      ranges.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 > e1 + 1, s"adjacent spans not merged in doc $doc")
        case _ =>
      }
      ranges.foreach { case (s, e) =>
        assert(s >= 1 && e <= lens(doc) - 4, s"span out of gram range in doc $doc") }
      ss.foreach(r => assert(r.getLong(3) === r.getLong(2) + 4)) // span_tokens = n_grams + k - 1
    }
  }

  test("dsirWeights: weights are positive and rank the target slice above the rest") {
    val w = TextOps.dsirWeights(docs, col("lang") === "en")
    assert(w.count() === docs.count())
    assert(w.filter(col("dsir_weight") <= 0).count() === 0L)
    val means = w.join(docs.select(col("doc_id"), (col("lang") === "en").as("t")), "doc_id")
      .groupBy(col("t")).agg(org.apache.spark.sql.functions.avg(col("dsir_weight")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en docs should score higher: en=${means(true)} other=${means(false)}")
  }

  test("lenQuantiles: ordered estimates that bracket the exact median") {
    val q = TextOps.lenQuantiles(docs, binWidth = 16).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val (p50, p90, p99) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val exact = r.getDouble(6)
      assert(p50 <= p90 && p90 <= p99)
      assert(p50 <= exact + 1e-9 && exact < p50 + 16,
        s"exact median $exact outside [$p50, ${p50 + 16}) for ${r.getString(0)}")
    }
  }

  test("shuffleShards: a permutation with contiguous per-shard positions") {
    val s = TextOps.shuffleShards(docs, nShards = 16)
    assert(s.select("doc_id").distinct().count() === docs.count())
    val bad = s.groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"), min(col("pos")).as("mn"),
        countDistinct(col("pos")).as("dp"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1L || col("dp") =!= col("c"))
    assert(bad.count() === 0L, "positions must be a contiguous 1..c per shard")
  }

  test("int8QuantStats: reconstruction error bounded by half a quantization step") {
    val s = VectorOps.int8QuantStats(emb)
    assert(s.count() === emb.count())
    // per-component |err|·255 <= rng/2 (+1 for the integer rounding)
    val bad = s.filter(col("max_err_x255") * 2 > (col("mx") - col("mn")) + 1).count()
    assert(bad === 0L, "quantization error exceeded half a step")
    // degenerate constant vector codes exactly
    assert(s.filter(col("mx") === col("mn"))
      .filter(col("max_err_x255") =!= 0L).count() === 0L)
  }

  test("bpeLearn: hand-computed merge sequence — tie-break, non-overlap, exhaustion") {
    import spark.implicits._
    // word counts: abab:3, abc:2, aaaa:1
    val tiny = Seq("abab abab abab abc abc aaaa").toDF("text")
    val got = TextOps.bpeLearn(tiny, nMerges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // r1 (a,b) n=8; r2 tie (ab,ab)=3 vs (a,a)=3 -> lowest left wins (a,a);
    // "aaaa" merges LEFT-TO-RIGHT non-overlapping -> [aa,aa] (not [aa,a,a]);
    // r5 consumes the last pair, r6 finds none -> 5 rows, not 10
    assert(got.toSeq === Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "a", "a", "aa", 3L),
      (3L, "ab", "ab", "abab", 3L),
      (4L, "ab", "c", "abc", 2L),
      (5L, "aa", "aa", "aaaa", 1L)))
  }

  test("bpeEncode: hand-computed symbol sequences and exact token counts") {
    import spark.implicits._
    val tiny = Seq((1L, "abab abab abab abc abc aaaa"))
      .toDF("doc_id", "text")
    // after 2 merges ((a,b)->ab, (a,a)->aa): abab=[ab,ab], abc=[ab,c],
    // aaaa=[aa,aa] -> 3*2 + 2*2 + 2 = 12 BPE tokens over 6 words
    val two = TextOps.bpeEncode(tiny, nMerges = 2).collect()
    assert(two.length === 1)
    assert(two(0).getLong(two(0).fieldIndex("n_words")) === 6L)
    assert(two(0).getLong(two(0).fieldIndex("bpe_tokens")) === 12L)
    assert(two(0).getString(two(0).fieldIndex("bpe_text")) ===
      "ab|ab ab|ab ab|ab ab|c ab|c aa|aa")
    // the full 5-merge table collapses every word to one symbol
    val full = TextOps.bpeEncode(tiny, nMerges = 10).collect()
    assert(full(0).getLong(full(0).fieldIndex("bpe_tokens")) === 6L)
    assert(full(0).getString(full(0).fieldIndex("bpe_text")) ===
      "abab abab abab abc abc aaaa")
  }

  test("bpe vocabulary persistence: parquet roundtrip and frozen replay equal the direct path") {
    val (merges, wsyms) = TextOps.bpeLearnState(docs, nMerges = 20)
    val direct = TextOps.bpeEncodeWith(docs, wsyms)
    val dir = "target/graft-tmp/bpe_vocab_spec"
    merges.write.mode("overwrite").parquet(s"$dir/merges")
    wsyms.write.mode("overwrite").parquet(s"$dir/wordsyms")
    // reloaded word table serves identically (S11 persistence semantics)
    val viaWsyms = TextOps.bpeEncodeWith(docs, spark.read.parquet(s"$dir/wordsyms"))
    assert(viaWsyms.exceptAll(direct).isEmpty && direct.exceptAll(viaWsyms).isEmpty)
    // the merge table ALONE reconstructs the encode: frozen rank-order
    // replay over the corpus equals the learner's own word table
    val viaMerges = TextOps.bpeEncodeFrozen(docs, spark.read.parquet(s"$dir/merges"))
    assert(viaMerges.exceptAll(direct).isEmpty && direct.exceptAll(viaMerges).isEmpty)
    assert(direct.count() === docs.count())
  }

  test("applyMerges on unseen words: frozen encode covers out-of-vocabulary text") {
    import spark.implicits._
    val train = Seq((1L, "abab abab abc")).toDF("doc_id", "text")
    val merges = TextOps.bpeLearn(train, nMerges = 2) // (a,b)->ab, (ab,ab)->abab
    // val corpus: 'ababab' and 'xbay' never occur in train
    val value = Seq((9L, "ababab xbay abab")).toDF("doc_id", "text")
    val got = TextOps.bpeEncodeFrozen(value, merges).collect()
    assert(got.length === 1)
    // ababab -> [abab, ab] (left-to-right non-overlap at rank 2);
    // xbay -> [x, b, a, y] (no pair applies); abab -> [abab]
    assert(got(0).getString(got(0).fieldIndex("bpe_text")) === "abab|ab x|b|a|y abab")
    assert(got(0).getLong(got(0).fieldIndex("bpe_tokens")) === 7L)
  }

  test("snapshotDiff: the four statuses partition the id union; added+changed is the re-process slice") {
    import spark.implicits._
    val oldSnap = Seq((1L, "same text", "s"), (2L, "will change", "s"),
      (3L, "will vanish", "s")).toDF("doc_id", "text", "source")
    val newSnap = Seq((1L, "same text", "s"), (2L, "did change", "s"),
      (4L, "brand new", "s")).toDF("doc_id", "text", "source")
    val got = TextOps.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // and on the deterministic corpus snapshots: statuses partition the
    // union and every status occurs (the query construction guarantees
    // all four bands are non-empty at the fixture draw rates)
    val q = graft.queries.TextQueries.queries("corpus_snapshot_diff")(
      spark, "/root/testdata/sf0.001")
    val counts = q.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("added", "removed", "changed", "unchanged"))
    assert(counts.values.forall(_ > 0L))
  }

  test("cdcDedupRatio: totals reconcile with the chunk table and repeats raise exactly the ratio") {
    import spark.implicits._
    val out = TextOps.cdcDedupRatio(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // chunk totals reconcile with the raw chunk table per source
    val raw = TextOps.cdcChunks(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("c"), sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out.foreach { case (src, nc, nd, tot, uniq, ratio) =>
      assert((nc, tot) === raw(src))
      assert(nd <= nc && uniq <= tot)
      assert(ratio >= 1.0 - 1e-9)
    }
    // a duplicated document doubles its chunks' counts but not the
    // unique mass: one source, one doc repeated 3x plus a fresh doc
    val rep = (1 to 40).map(i => s"c$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = Seq((1L, rep, "s"), (2L, rep, "s"), (3L, rep, "s"), (4L, other, "s"))
      .toDF("doc_id", "text", "source")
    val one = TextOps.cdcDedupRatio(d).collect().head
    val (nc, nd, tot, uniq) =
      (one.getLong(1), one.getLong(2), one.getLong(3), one.getLong(4))
    // rep's chunks appear 3x, other's once: stored mass 3*40 + 40,
    // unique mass 40 + 40 -> ratio exactly 2.0
    assert(tot === uniq + 2 * 40L)
    assert(nc - nd > 0L, "duplicated chunks must exist")
    assert(one.getDouble(5) === 2.0)
  }

  test("cdcChunks: chunks tile each document; boundaries re-synchronize after an edit") {
    import spark.implicits._
    val chunks = TextOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tiling: per doc, chunks are contiguous from token 1 to n
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
      assert(sorted.last._3 + sorted.last._4 - 1 == lens(doc))
    }
    // EDIT RESILIENCE (the property fixed-stride chunking lacks): put a
    // token in front of a document — every chunk after the first
    // re-synchronized boundary keeps its content hash
    val base = docs.orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).head.getString(1)
    val pair = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(pair).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val ha = out.filter(_._1 == 1L).map(_._2)
    val hb = out.filter(_._1 == 2L).map(_._2)
    val shared = ha.toSet.intersect(hb.toSet).size
    assert(shared >= ha.length - 2,
      s"only $shared of ${ha.length} chunk hashes survived a front insertion")
  }

  test("bpeCompressionStats: totals reconcile with per-doc stats and fertility >= per-word floor") {
    val (_, wsyms) = TextOps.bpeLearnState(docs, nMerges = 20)
    val bill = TextOps.bpeEncodeWith(docs, wsyms)
    val out = TextOps.bpeCompressionStats(docs, bill).collect()
    val totDocs = out.map(_.getLong(1)).sum
    assert(totDocs === docs.count())
    // every slice: at least one BPE token per word (a word never merges
    // across its boundary), and chars strictly exceed the token count
    // for multi-char tokens
    out.foreach { r =>
      val (words, toks) = (r.getLong(3), r.getLong(4))
      assert(toks >= words, s"${r.getString(0)}: fewer tokens than words")
      assert(r.getDouble(6) >= 1.0 - 1e-9) // fertility
    }
    // global BPE token total matches the bill's own sum
    val billTot = bill.agg(sum(col("bpe_tokens"))).head.getLong(0)
    assert(out.map(_.getLong(4)).sum === billTot)
  }

  test("bpeFertility: totals reconcile with the bill; premium is the corpus-relative ratio") {
    val (_, wsyms) = TextOps.bpeLearnState(docs, nMerges = 20)
    val bill = TextOps.bpeEncodeWith(docs, wsyms)
    val out = TextOps.bpeFertility(docs, bill).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // every document lands in exactly one language slice
    assert(out.map(_._2).sum === docs.count())
    val billTot = bill.agg(sum(col("bpe_tokens"))).head.getLong(0)
    assert(out.map(_._4).sum === billTot)
    val totWords = out.map(_._3).sum
    out.foreach { case (lang, _, w, t, fert, prem) =>
      assert(fert >= 1.0 - 1e-9, s"$lang fertility below the per-word floor")
      // premium recomputed from the exact sums matches the column
      val want = (t.toDouble * totWords) / (w.toDouble * billTot)
      assert(math.abs(prem - want) < 1e-3, s"$lang premium $prem vs $want")
    }
    // premiums bracket 1: some language is above corpus mean iff
    // another is below (word-weighted mean premium is exactly 1)
    val wMean = out.map(r => r._3.toDouble * r._6).sum / totWords
    assert(math.abs(wMean - 1.0) < 1e-2)
  }

  test("bpeOovRate: train split has zero OOV by construction; rates reconcile") {
    val sp = TextOps.splitCol(valFrac = 0.1, testFrac = 0.05)
    val trainVocab = TextOps.bpeLearnState(
      docs.filter(sp === "train"), nMerges = 2)._2
    val out = TextOps.bpeOovRate(docs, trainVocab).collect()
      .map(r => r.getString(0) -> r).toMap
    // the vocabulary was learned on exactly the train split
    assert(out("train").getLong(2) === 0L)
    assert(out("train").getLong(4) === 0L)
    // occurrences and distinct counts are consistent per split
    out.values.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_oov <= n_words
      assert(r.getLong(4) <= r.getLong(3)) // distinct_oov <= distinct
    }
  }

  test("semDedup: verdicts at-threshold, keep-min-id, and confined to shared cells") {
    val thr = 0.4
    val d = VectorOps.semDedup(emb, threshold = thr)
    val rows = d.collect()
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "dup_of must be a lower id")
      assert(r.getDouble(2) >= thr - 1e-6)
    }
    // verdict vec_ids unique (one row per duplicate)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // every (vec_id, dup_of) pair shares a k-means cell
    val cents = VectorOps.kmeansCentroids(emb)
    val cells = VectorOps.kmeansRanked(emb, cents, maxRank = 1)
      .select(col("vec_id"), col("cid"))
    val mism = d.join(cells, Seq("vec_id"))
      .join(cells.select(col("vec_id").as("dup_of"), col("cid").as("cid2")), Seq("dup_of"))
      .filter(col("cid") =!= col("cid2")).count()
    assert(mism === 0L)
  }

  test("thresholdSweep: survival curve is monotone and consistent with direct pair counts") {
    import graft.pipeline.DedupOps
    val ts = Seq(0.3, 0.5, 0.7, 0.9)
    // ONE collect serves every assertion below — a second thresholdSweep
    // call would re-run the eager pair mining + union-find
    val rows = DedupOps.thresholdSweep(docs, thresholds = ts).collect()
    val sweep = rows
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(sweep.map(_._1).toSeq == ts)
    // counts never increase as the threshold rises
    sweep.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1) }
    // each point equals a direct minhashPairs count at that threshold
    // (compare on the rounded jaccard exactly like the sweep does)
    val scored = DedupOps.minhashPairs(docs, threshold = 0.05)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    ts.foreach { t =>
      val surviving = scored.filter(_._2 >= t)
      val (_, np, nd) = sweep.find(_._1 == t).get
      assert(np == surviving.length.toLong, s"pairs at $t")
      assert(nd == surviving.map(_._1).distinct.length.toLong, s"docs at $t")
    }
    // n_docs_removed carries component semantics: at every threshold it
    // equals the non-representative member count of GraphOps components
    // over the surviving pair graph (the production removal bill,
    // distinct from the pairwise n_docs_flagged)
    val removed = rows.map(r => (r.getDouble(0), r.getLong(3))).toMap
    val pairs = DedupOps.minhashPairs(docs, threshold = 0.05).persist()
    ts.foreach { t =>
      val comp = graft.pipeline.GraphOps.connectedComponents(
        pairs.filter(col("jaccard") >= t)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val want = comp.filter(col("id") =!= col("comp_id")).count()
      assert(removed(t) == want, s"removal bill at $t")
    }
    pairs.unpersist()
  }

  test("capBands drops exactly the over-cap buckets; minhashPairs still finds small-family dups") {
    import spark.implicits._
    import graft.pipeline.DedupOps
    // hand band frame: bucket "hot" holds 4 docs, "cold" holds 2
    val bands = Seq((1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"),
      (5L, "cold"), (6L, "cold")).toDF("doc_id", "bkey")
    val capped = DedupOps.capBands(bands, maxBucket = 3).collect()
      .map(r => (r.getLong(1), r.getString(0))).toSet
    assert(capped == Set((5L, "cold"), (6L, "cold")))
    // end-to-end: a small near-dup family (bucket size << cap) is
    // unaffected by the cap — the pair miner still verifies it
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("chi2Shift: zero for identical distributions, exact hand value for a skewed source") {
    import spark.implicits._
    // two sources with the SAME token distribution sit exactly at the
    // corpus expectation -> chi2 identically 0
    val same = Seq((1L, "a a b", "s1"), (2L, "a a b", "s2"))
      .toDF("doc_id", "text", "source")
    val g1 = TextOps.chi2Shift(same).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(g1 == Set(("s1", 3L, 0.0), ("s2", 3L, 0.0)))
    // corpus a:2 b:4 over 6; each source 3 tokens -> e = (1, 2); hand
    // chi2 = (2-1)^2/1 + (1-2)^2/2 = 1.5 for both sides of the skew
    val skew = Seq((1L, "a a b", "s1"), (2L, "b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val g2 = TextOps.chi2Shift(skew).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(g2 == Map("s1" -> 1.5, "s2" -> 1.5))
  }

  test("mojibakeStats: hand-counted artifacts and clean verdicts") {
    import spark.implicits._
    val d = Seq(
      (1L, "clean text here"),
      (2L, "damaged cafÃ© and naÃ¯ ve with � twice �"),
      (3L, "ctrl\u0007char\u0001here")).toDF("doc_id", "text")
    val got = TextOps.mojibakeStats(d, col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, true),
      (2L, 2L, 2L, 0L, false),
      (3L, 0L, 0L, 2L, false)))
  }

  test("bpeLearnGrouped: per-group results equal independent bpeLearn runs") {
    import spark.implicits._
    val d = Seq(
      (0L, "abab abab abc", "x"), (1L, "abc aaaa ab", "x"),
      (2L, "cdcd cd cdc", "y"), (3L, "cdc cccc cd", "y"),
      (4L, "ab cd abcd", "x")).toDF("doc_id", "text", "g")
    val grouped = TextOps.bpeLearnGrouped(d, col("g"), nMerges = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5))).toSet
    val solo = Seq("x", "y").flatMap { g =>
      TextOps.bpeLearn(d.filter(col("g") === g), nMerges = 5)
        .collect().map(r => (g, r.getLong(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4)))
    }.toSet
    assert(grouped == solo)
    // exhaustion is per-group: a tiny group stops early without
    // truncating the other group's rank sequence
    val d2 = Seq((0L, "aa", "small"), (1L, "abab abab abc cddc", "big"))
      .toDF("doc_id", "text", "g")
    val g2 = TextOps.bpeLearnGrouped(d2, col("g"), nMerges = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val smallRanks = g2.filter(_._1 == "small").map(_._2).sorted
    val bigRanks = g2.filter(_._1 == "big").map(_._2).sorted
    assert(smallRanks == (1L to smallRanks.length))
    assert(bigRanks == (1L to bigRanks.length))
    assert(bigRanks.length > smallRanks.length)
  }

  test("refLmScore: the model is FROZEN on the reference slice") {
    import spark.implicits._
    val ref = Seq((0L, "the cat sat", "ref"), (1L, "the cat ran", "ref"))
    val junk = Seq((2L, "zz yy xx ww", "web"), (3L, "the cat sat", "web"))
    val mk = (rows: Seq[(Long, String, String)]) =>
      rows.toDF("doc_id", "text", "source")
    val pred = col("source") === "ref"
    val small = TextOps.refLmScore(mk(ref ++ junk.take(1)), pred)
    val big = TextOps.refLmScore(mk(ref ++ junk), pred)
    // adding a NON-reference doc must not move any other doc's score
    val a = small.filter(col("doc_id") <= 2).orderBy("doc_id").collect().toSeq
    val b = big.filter(col("doc_id") <= 2).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a doc of tokens the reference never saw: every transition is OOV
    val oov = big.filter(col("doc_id") === 2).head
    assert(oov.getAs[Long]("n_oov") === oov.getAs[Long]("n_trans"))
    // a reference-identical doc scores the reference's own probabilities:
    // "the cat" (c2=2, c1=2) and "cat sat" (c2=1, c1=2), V=4
    // ⇒ p = 3/6 and 2/6
    val twin = big.filter(col("doc_id") === 3).head
    assert(twin.getAs[Long]("n_oov") === 0L)
    assert(math.abs(twin.getAs[Double]("avg_p") - ((3.0 / 6 + 2.0 / 6) / 2)) < 1e-4)
  }
}
