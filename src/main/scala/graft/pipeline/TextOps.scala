package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: token statistics, quality scoring, n-gram-heuristic
  * language ID, and document fingerprinting.
  *
  * Everything is pure Column DSL (whole-stage codegen, no UDFs); per-doc
  * operators are embarrassingly parallel, so the plans scale linearly with
  * document count — no shuffles except where aggregation is the point.
  */
object TextOps {

  /** Whitespace tokens of the `text` column. */
  val tokens: Column = split(col("text"), " ")

  /** Per-language marker-word lists for the n-gram/stopword language-ID
    * heuristic (public-knowledge function words). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "que", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "du", "dans", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def markerCount(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isInCollection(words)))

  /** Token statistics: counts, distinct counts, char length, mean token
    * length. Integer arithmetic → engine-exact. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val ts = tokens
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(ts).as("n_tokens"),
      size(array_distinct(ts)).as("n_distinct"),
      round(aggregate(transform(ts, t => length(t)), lit(0), _ + _).cast("double") /
        size(ts) + lit(1e-9), 4).as("mean_tok_len"))
  }

  /** SEQUENCE PACKING for LLM pretraining: concatenate documents in
    * deterministic order and cut every `budget` tokens (GPT-style packing
    * — a document may straddle a pack boundary; `straddles` flags it so a
    * loader can mask or split). Docs are hashed into `groups` independent
    * streams — the parallel unit: each group's running sum is one window
    * partition, so parallelism (and the per-task row bound) scales by
    * raising `groups` with the corpus, never a global window. Output one
    * row per document: (grp, doc_id, n_tokens, pack_id, straddles). */
  def packAssignments(docs: DataFrame, budget: Int = 2048,
                      groups: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), size(tokens).cast("long").as("n_tokens"))
      .withColumn("grp", pmod(col("doc_id"), lit(groups.toLong)))
      .withColumn("cum0", coalesce(sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("grp"), col("doc_id"), col("n_tokens"),
        expr(s"cum0 div $budget").as("pack_id"),
        (expr(s"(cum0 + n_tokens - 1) div $budget") > expr(s"cum0 div $budget"))
          .as("straddles"))
  }

  /** Deterministic uniform INTEGER draw in [0, 1e6) from md5(salt:doc_id)
    * — the content-independent split/sampling primitive: stable under
    * corpus growth and reshuffling, and compared against integer
    * thresholds so no float-boundary value can diverge across engines. */
  val DrawMod = 1000000L
  def mdDraw6(salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long") % DrawMod

  /** Probability → integer draw threshold. */
  def drawThreshold(p: Double): Long = math.round(p * DrawMod)

  /** Deterministic train/val/test split (fractions `valFrac`/`testFrac`):
    * each document's fate depends only on (salt, doc_id), so the split is
    * stable as the corpus grows — adding documents never moves an
    * existing one across splits (the property a by-position random split
    * lacks). Per-row map, no shuffle. */
  def splitAssign(docs: DataFrame, valFrac: Double, testFrac: Double,
                  salt: String = "split"): DataFrame = {
    val u = mdDraw6(salt)
    docs.select(col("doc_id"),
      when(u < drawThreshold(valFrac), "val")
        .when(u < drawThreshold(valFrac + testFrac), "test")
        .otherwise("train").as("split"))
  }

  /** MIXTURE SAMPLING: down/down-weight corpus slices to target rates (the
    * data-mixing step before pretraining). `rates` maps a slice key (the
    * `source` column) to a keep probability in [0, 1]; each doc keeps iff
    * its deterministic draw < its slice's threshold (unlisted slices keep
    * everything). Per-row map against a broadcast rate table — no
    * shuffle, linear at any corpus size. */
  def sampleMixture(docs: DataFrame, rates: Map[String, Double],
                    salt: String = "mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.map { case (k, p) => (k, drawThreshold(p)) }
      .toDF("source", "thr")
    docs.join(broadcast(rateDf), Seq("source"), "left")
      .filter(mdDraw6(salt) < coalesce(col("thr"), lit(DrawMod)))
      .select(col("doc_id"), col("source"))
  }

  /** Quality score: blend of length, stopword ratio, token length and
    * lexical diversity — the standard cheap pre-filter for web-scale corpus
    * cleaning (length/punct/stopword-ratio heuristics). */
  def quality(docs: DataFrame): DataFrame = {
    val ts = tokens
    val n = size(ts).cast("double")
    val stopRatio = markerCount(ts, langMarkers.toMap.apply("en")).cast("double") / n
    val meanLen = aggregate(transform(ts, t => length(t)), lit(0), _ + _).cast("double") / n
    val distinctRatio = size(array_distinct(ts)).cast("double") / n
    docs.select(
      col("doc_id"),
      round(stopRatio + lit(1e-9), 4).as("stop_ratio"),
      round(distinctRatio + lit(1e-9), 4).as("distinct_ratio"),
      round(
        lit(0.3) * least(lit(1.0), n / 100) +
        lit(0.3) * (lit(1.0) - stopRatio) +
        lit(0.2) * least(lit(1.0), meanLen / 8) +
        lit(0.2) * distinctRatio + lit(1e-9), 4).as("quality"))
  }

  /** Language ID: argmax of per-language marker hits, ties broken by
    * language code ascending (deterministic). */
  def langId(docs: DataFrame): DataFrame = {
    val ts = tokens
    val scored = docs.select(
      col("doc_id") +: langMarkers.map { case (l, ws) =>
        markerCount(ts, ws).as(s"s_$l") }: _*)
    // argmax via greatest + cascaded when (5 languages, tie → first asc).
    val best = langMarkers.map { case (l, _) => col(s"s_$l") }
    val maxScore = greatest(best: _*)
    val pred = langMarkers.foldLeft(lit(null).cast("string")) {
      case (acc, (l, _)) =>
        when(acc.isNull && col(s"s_$l") === maxScore, lit(l)).otherwise(acc)
    }
    scored.select(col("doc_id") +: langMarkers.map { case (l, _) => col(s"s_$l") }
      :+ pred.as("pred_lang"): _*)
  }

  /** Shingle-window width and the polynomial-hash constants of
    * `fp_shingle_min` (Rabin–Karp base 131 mod 1e9+7). The per-window
    * weights are pre-reduced mod P so every term fits a long:
    * code (< 2^16 BMP codepoint) × weight (< P ≈ 2^30) < 2^46, and the
    * 8-term sum stays far under 2^63. */
  val ShingleW = 8
  val HashP = 1000000007L
  val ShinglePows: IndexedSeq[Long] =
    (0 until ShingleW).scanLeft(1L)((a, _) => a * 131L % HashP)
      .take(ShingleW).reverse.toIndexedSeq

  /** Document fingerprints:
    *  - `fp64`: 60-bit content hash from md5 (engine-portable exact);
    *  - `fp_roll`: position-weighted rolling token hash mod 1e9+7 — tokens
    *    hashed by (first char, length, last char), weighted by position;
    *  - `fp_shingle_min`: min over all 8-char windows of a Rabin–Karp
    *    polynomial hash of the window's codepoints — the winnowing-style
    *    robust content fingerprint. Integer arithmetic only (a per-window
    *    md5 costs a digest per character position — ~10× the wall time of
    *    this whole query — and buys nothing over a polynomial hash for
    *    fingerprint purposes).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val ts = tokens
    val tokVal = (t: Column) =>
      ascii(substring(t, 1, 1)) * 131 + length(t) * 31 +
        ascii(substring(t, -1, 1))
    val rolled = aggregate(
      zip_with(ts, sequence(lit(1), size(ts)),
        (t, i) => (tokVal(t) * ((i % 1000) + 1)).cast("long")),
      lit(0L), _ + _) % HashP
    // codepoint array once per doc; windows index into it (no per-window
    // string allocation). Out-of-range → null → 0: short docs zero-pad
    // (try_element_at, NOT element_at — under ANSI mode the latter throws
    // on the out-of-bounds tail instead of yielding null).
    val shingleMin = {
      val h = (i: Column) => (0 until ShingleW).map(j =>
        coalesce(try_element_at(col("cs"), i + lit(j)), lit(0L)) * lit(ShinglePows(j)))
        .reduce(_ + _) % HashP
      array_min(transform(
        sequence(lit(1), greatest(size(col("cs")) - (ShingleW - 1), lit(1))), h))
    }
    docs.select(
      col("doc_id"),
      col("text"),
      transform(split(col("text"), ""), c => ascii(c).cast("long")).as("cs"))
      .select(
        col("doc_id"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("fp64"),
        rolled.as("fp_roll"),
        shingleMin.as("fp_shingle_min"))
  }

  /** [[fingerprints]]' shingle-min column via the NATIVE
    * [[graft.functions.ShingleMinHash]] expression (O(n) rolling update,
    * codegen'd static call) instead of the portable Column-DSL window
    * re-sum. Requires the session to carry
    * `spark.sql.extensions=graft.GraftExtensions`; bit-equal to the DSL
    * form by construction (pinned by a property test and the shared
    * DuckDB oracle). */
  def fingerprintsNative(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      call_function("shingle_min_hash", col("text")).as("fp_shingle_min"))

  /** REPETITION SIGNALS (the Gopher-style repetitiousness filters used in
    * web-corpus cleaning): per document,
    *  - `dup_token_frac`: fraction of token occurrences that are repeats
    *    of an earlier token (1 − distinct/total);
    *  - `top_bigram_frac`: occurrences of the most frequent token bigram
    *    over all n−1 bigrams (0 for single-token docs; ties by count are
    *    frequency-only so the fraction is well-defined);
    *  - `max_run`: longest run of one repeated token.
    * Explode → per-(doc, bigram) count → per-doc max: linear work, one
    * shuffle keyed by doc_id with map-side combine — no collect, scales
    * with corpus size. The run length uses a token-change cumulative sum
    * inside a per-doc window (bounded by document length). */
  def repetition(docs: DataFrame): DataFrame = {
    val ts = tokens
    val base = docs.select(col("doc_id"), ts.as("ts"),
      size(ts).cast("long").as("n"))
    // (doc, position, token) rows; runs found by counting token changes
    val toks = base.select(col("doc_id"), col("n"),
      posexplode(col("ts")).as(Seq("i", "t")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val runs = toks
      .withColumn("chg",
        when(lag(col("t"), 1).over(w).isNull ||
          lag(col("t"), 1).over(w) =!= col("t"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("run_id")).agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc_id")).agg(max(col("run_len")).as("max_run"))
    val bigrams = base
      .select(col("doc_id"), col("n"), posexplode(col("ts")).as(Seq("i", "t")))
      .withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
      .groupBy(col("doc_id"), col("n"), col("t"), col("t2"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n")).agg(max(col("c")).as("top_bg"))
      .select(col("doc_id"),
        round(col("top_bg").cast("double") / (col("n") - 1) + lit(1e-9), 4)
          .as("top_bigram_frac"))
    base.select(col("doc_id"), col("n"),
      round(lit(1.0) - size(array_distinct(col("ts"))).cast("double") / col("n")
        + lit(1e-9), 4).as("dup_token_frac"))
      .join(bigrams, Seq("doc_id"), "left")
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"), col("dup_token_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Corpus-wide top-k token bigrams by occurrence count (vocabulary
    * statistics over the whole corpus): explode each document's adjacent
    * token pairs, count per bigram, keep the k most frequent (ties by
    * bigram text, fully deterministic). The groupBy's map-side partial
    * aggregation collapses the exploded rows before the single shuffle,
    * and the final top-k is a TakeOrdered over the (distinct-bigram-sized)
    * aggregate — no global sort materializes. */
  def topBigrams(docs: DataFrame, k: Int): DataFrame = {
    val ts = tokens
    docs
      .select(posexplode(zip_with(
        slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as(Seq("i", "bigram")))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }
}
