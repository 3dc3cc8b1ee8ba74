package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: an opaque binary payload (image/audio/video bytes)
  * plus typed metadata. The decode step is a STUB — this container has no
  * codec libraries — but the payload is real `binary` data and every
  * operator consumes it byte-wise through typed iterators, so the schema,
  * partitioning, function signatures and batch shape are the production
  * plumbing. */
case class MMRecord(doc_id: Long, kind: String, payload: Array[Byte],
                    width: Int, height: Int, frames: Int, frame_size: Int)

/** Multimodal-column operators for a training-data pipeline: synthesize /
  * decode(stub) / frame-sample / feature-extract / resize over binary
  * payloads. Processing runs as `mapPartitions` over a typed Dataset —
  * records stream through each partition in batches exactly like
  * arrow-batched pandas UDFs would, and nothing ever collects to the
  * driver. Payload bytes are md5-derived, so DuckDB oracles can recompute
  * every output through the hex representation (byte i = the i-th hex
  * pair).
  */
object MultimodalOps {

  val FRAME_SIZE = 32 // bytes per synthetic frame = 2 md5 digests
  val FRAMES = 4

  /** Record kinds by doc_id % 3 (oracles derive their kind predicates
    * from indexOf over THIS list, so the stub geometry can't desync). */
  val KINDS = Seq("image", "audio", "video")

  /** Default shot-boundary threshold: ~the median of the uniform-byte
    * expectation E|a−b| ≈ 85/byte × FRAME_SIZE bytes. Shared by the
    * query registration and the DuckDB oracle. */
  val SCENE_CUT_THRESHOLD = 2720L

  /** Synthesize the multimodal table from `documents`: payload =
    * concat(md5(doc_id:k) digests), kind/width/height from doc_id. */
  def mmTable(docs: DataFrame): DataFrame = {
    val chunks = FRAMES * FRAME_SIZE / 16 // md5 digest = 16 bytes
    docs.select(
      col("doc_id"),
      element_at(typedlit(KINDS),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(concat_ws("", transform(sequence(lit(0), lit(chunks - 1)),
        k => md5(concat(col("doc_id").cast("string"), lit(":"), k.cast("string"))))))
        .as("payload"),
      (col("doc_id") % 32 + 8).cast("int").as("width"),
      (col("doc_id") % 24 + 6).cast("int").as("height"),
      lit(FRAMES).as("frames"),
      lit(FRAME_SIZE).as("frame_size"))
  }

  def asRecords(mm: DataFrame): Dataset[MMRecord] = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.as[MMRecord]
  }

  /** Frame sampling: keep every `stride`-th frame, emit per-frame byte
    * checksums (the stub "decode": real slicing of real bytes; a codec
    * would decode the slice instead). */
  def frameSample(mm: Dataset[MMRecord], stride: Int): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.mapPartitions(_.flatMap { r =>
      Iterator.range(0, r.frames, stride).map { f =>
        val bytes = r.payload.slice(f * r.frame_size, (f + 1) * r.frame_size)
        (r.doc_id, f, bytes.length.toLong,
          bytes.map(b => (b & 0xff).toLong).sum)
      }
    }).toDF("doc_id", "frame_idx", "n_bytes", "checksum")
  }

  /** Feature extraction: 16-bucket byte histogram (high nibble) per
    * payload — the cheap content signature you'd feed a downstream
    * dedup/classifier stage. */
  def byteHistogram(mm: Dataset[MMRecord]): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.mapPartitions(_.map { r =>
      val hist = new Array[Long](16)
      r.payload.foreach(b => hist((b & 0xff) >> 4) += 1)
      (r.doc_id, hist.toSeq)
    }).toDF("doc_id", "hist")
      .select(col("doc_id"), posexplode(col("hist")).as(Seq("bucket", "n")))
  }

  /** Audio-style energy curve: mean-square byte amplitude per fixed-size
    * window of the payload (a codec would PCM-decode first — the stub
    * treats each byte, centered at 128, as a sample). One row per
    * (doc, window): the per-frame feature sequence a downstream VAD /
    * silence-trim / segment-dedup stage consumes. Integer arithmetic
    * (sum of squares, window length) so the oracle is exact. */
  def energyCurve(mm: Dataset[MMRecord], windowBytes: Int): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.mapPartitions(_.flatMap { r =>
      r.payload.grouped(windowBytes).zipWithIndex.map { case (win, i) =>
        val ss = win.map { b => val c = (b & 0xff) - 128L; c * c }.sum
        (r.doc_id, i.toLong, win.length.toLong, ss)
      }
    }).toDF("doc_id", "win_idx", "n_bytes", "sum_sq")
  }

  /** SCENE-CUT detection over the stubbed decode — the video curation
    * step that picks representative frames per SHOT instead of sampling
    * uniformly: per consecutive frame pair, the L1 byte delta
    * Σ|b_f[i] − b_{f−1}[i]|, flagged a CUT where it exceeds
    * `threshold`. On real video the bytes would be the downscaled luma
    * plane — L1 frame difference is the classic shot-boundary feature;
    * the stub keeps the arithmetic (integer, oracle-exact) and the
    * plumbing (typed mapPartitions over video records, one row per
    * frame pair) real. Output: (doc_id, frame_idx, l1_delta, is_cut)
    * with frame_idx the LATER frame of the pair. */
  def sceneCuts(mm: Dataset[MMRecord], threshold: Long): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.filter(_.kind == "video").mapPartitions(_.flatMap { r =>
      Iterator.range(1, r.frames).map { f =>
        val prev = r.payload.slice((f - 1) * r.frame_size, f * r.frame_size)
        val cur = r.payload.slice(f * r.frame_size, (f + 1) * r.frame_size)
        var l1 = 0L
        var i = 0
        while (i < cur.length && i < prev.length) {
          l1 += math.abs((cur(i) & 0xff) - (prev(i) & 0xff)); i += 1
        }
        (r.doc_id, f, l1, l1 > threshold)
      }
    }).toDF("doc_id", "frame_idx", "l1_delta", "is_cut")
  }

  /** Perceptual difference-hash (dHash) over the stubbed decode: bit i =
    * [byte_i < byte_{i+1}] over the first 61 payload bytes → a 60-bit
    * signature (kept under the sign bit so both engines hold it in a
    * plain BIGINT). On real images the bytes would be the resized
    * grayscale row — the standard near-duplicate image fingerprint;
    * grouping or hamming-banding the signatures is then ordinary
    * relational work (the [[graft.pipeline.DedupOps.simhash]] shape).
    * One row per doc: (doc_id, phash60). */
  def perceptualHash(mm: Dataset[MMRecord]): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.mapPartitions(_.map { r =>
      var h = 0L
      var i = 0
      val n = math.min(60, r.payload.length - 1)
      while (i < n) {
        if ((r.payload(i) & 0xff) < (r.payload(i + 1) & 0xff)) h |= (1L << i)
        i += 1
      }
      (r.doc_id, h)
    }).toDF("doc_id", "phash60")
  }

  /** [[mmTable]] plus PLANTED NEAR-DUPLICATE TWINS: every 50th record
    * gains a copy (doc_id + 1e9) whose payload differs in exactly ONE
    * byte (position doc_id % 61, value +1 mod 256) — the controlled
    * fixture for perceptual-hash dedup, where a genuinely random corpus
    * would make every near-dup query vacuously empty. One flipped byte
    * perturbs at most two adjacent dHash comparisons, so each twin sits
    * within hamming 2 of its original. The tweak is hex-string surgery
    * on the md5-derived payload (pure Column work, replayed by the
    * oracle as byte arithmetic). */
  def mmTableWithTwins(docs: DataFrame): DataFrame = {
    val base = mmTable(docs)
    val hx = lower(hex(col("payload")))
    val p = (col("doc_id") % 61).cast("int")
    val tweaked = (conv(hx.substr(p * 2 + 1, lit(2)), 16, 10).cast("long") + 1L) % 256L
    val twins = base.filter(col("doc_id") % 50 === 0)
      .withColumn("payload", unhex(concat(
        hx.substr(lit(1), p * 2),
        lpad(lower(hex(tweaked)), 2, "0"),
        // remainder length from the string itself — a literal cap would
        // silently truncate twins if the payload geometry ever grows
        hx.substr(p * 2 + 3, length(hx)))))
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
    base.unionByName(twins)
  }

  /** Banding geometry of the multimodal near-dup pair miners — shared
    * with the DuckDB oracles (the urlInject convention) so a tuning
    * change can't silently desync them. 6 bands × 10 bits: pigeonhole-
    * complete at hamming ≤ 5. */
  val MM_BANDS = 6
  val MM_MAX_HAMMING = 5

  /** Hot-bucket cap for the banded signature join — the multimodal twin
    * of [[DedupOps.MaxBandBucket]]. Shared with the oracles. */
  val MM_MAX_BAND_BUCKET = 1000

  /** PERCEPTUAL-HASH NEAR-DUPLICATE PAIRS — the image twin of
    * [[DedupOps.minhashPairs]]: band the 60-bit dHash into `nBands`
    * disjoint bit slices, equi-join records sharing ANY (band, slice
    * value) — never all-pairs — then verify candidates by EXACT hamming
    * distance ≤ `maxHamming` (xor + bit_count, codegen'd integer work).
    * Pigeonhole recall guarantee: ≤ nBands − 1 differing bits leave at
    * least one band untouched, so every such pair IS a candidate; with
    * the default 6 bands the hamming-5 verdict set is complete across
    * distinct signatures. See [[bandedHammingPairs]] for the
    * representative contract on exact-signature families and the
    * hot-bucket cap. Output: (doc_a, doc_b, hamming). */
  def phashDups(mm: Dataset[MMRecord], maxHamming: Int = MM_MAX_HAMMING,
                nBands: Int = MM_BANDS): DataFrame =
    // hashes feed the banding AND both verification join sides — persist
    bandedHammingPairs(graft.CacheScope.persist(perceptualHash(mm)),
      "phash60", maxHamming, nBands)

  /** Shared banding+verify core of [[phashDups]]/[[audioFpDups]], with
    * the two guards a real multimodal corpus needs — degenerate
    * constant signatures are the NORM there (silent audio fingerprints
    * to all-zeros, a flat/black image to a constant dHash), and either
    * one would otherwise send a band bucket quadratic:
    *
    *  1. EXACT-SIGNATURE FAMILIES collapse to a representative first
    *     (the [[phashClusters]] idea applied at the pair level): every
    *     family member emits ONE star pair to the family's min-doc_id
    *     representative (hamming 0) — linear in family size where
    *     all-pairs is quadratic — and only the representatives enter
    *     the banded join (one row per DISTINCT signature value).
    *  2. HOT-BUCKET CAP: any remaining (band, slice) bucket holding
    *     more than [[MM_MAX_BAND_BUCKET]] distinct signatures is
    *     dropped from the candidate join (the [[DedupOps.capBands]]
    *     machinery — partial-agg hot-key count, anti-join), trading
    *     bounded recall on pathological buckets for a candidate join
    *     that stays linear.
    *
    * Banding: `nBands` disjoint bit slices of the 60-bit signature,
    * equi-join on (band, slice value), exact hamming (xor + bit_count)
    * verification ≤ `maxHamming`. Cross-family pairs surface as
    * REPRESENTATIVE pairs (doc_a, doc_b both family reps) — connected-
    * component consumers ([[phashClusters]]) see identical clusters,
    * and per-member pairs are recoverable by joining each rep's family.
    * Expects `sig` persisted by the caller (it feeds the family
    * groupBy and the star join). Output: (doc_a < doc_b, hamming). */
  private def bandedHammingPairs(sig: DataFrame, sigCol: String,
                                 maxHamming: Int, nBands: Int): DataFrame = {
    require(60 % nBands == 0, "nBands must divide 60")
    val bits = 60 / nBands
    val width = 1L << bits
    // exact-signature families: one representative (min doc_id) each;
    // persisted — feeds the star join, the banding, and both verify legs
    val fam = graft.CacheScope.persist(
      sig.groupBy(col(sigCol).as("sv")).agg(min(col("doc_id")).as("rep")))
    val stars = sig.join(fam, col(sigCol) === col("sv"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    val reps = fam.select(col("rep").as("doc_id"), col("sv").as(sigCol))
    val bands0 = reps.select(col("doc_id"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col(sigCol), b * bits) % width): _*)).as(Seq("band", "bk")))
      .select(col("doc_id"),
        concat_ws(":", col("band"), col("bk")).as("bkey"))
    val bands = DedupOps.capBands(bands0, MM_MAX_BAND_BUCKET)
    val cands = bands.select(col("doc_id").as("doc_a"), col("bkey"))
      .join(bands.select(col("doc_id").as("doc_b"), col("bkey")), Seq("bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val repPairs = cands
      .join(reps.select(col("doc_id").as("doc_a"), col(sigCol).as("ha")), Seq("doc_a"))
      .join(reps.select(col("doc_id").as("doc_b"), col(sigCol).as("hb")), Seq("doc_b"))
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    stars.unionByName(repPairs)
  }

  /** Audio-fingerprint energy-window size in bytes: the 128-byte stub
    * payload yields 64 windows → 63 deltas, of which the first 60 become
    * fingerprint bits (kept under the sign bit like [[perceptualHash]]).
    * Shared with the DuckDB oracle. */
  val AUDIO_FP_WIN = 2

  /** AUDIO FINGERPRINT over the stubbed decode — Chromaprint's published
    * core idea (Lalinský 2011: quantize the sign of successive
    * spectral-feature deltas into a bit signature): bit i =
    * [energy(win i+1) > energy(win i)] over [[AUDIO_FP_WIN]]-byte energy
    * windows of the payload (a codec pipeline would use chroma/spectral
    * frames — the stub keeps the exact-integer energy arithmetic of
    * [[energyCurve]] and the per-record row-local shape real). Audio
    * records only. One row per doc: (doc_id, afp60) — the audio twin of
    * [[perceptualHash]], closing the dedup-parity gap between the image
    * and audio modalities. */
  def audioFingerprint(mm: Dataset[MMRecord]): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.filter(_.kind == "audio").mapPartitions(_.map { r =>
      val wins = r.payload.grouped(AUDIO_FP_WIN)
        .map(_.map { b => val c = (b & 0xff) - 128L; c * c }.sum).toArray
      var h = 0L
      var i = 0
      val n = math.min(60, wins.length - 1)
      while (i < n) { if (wins(i + 1) > wins(i)) h |= (1L << i); i += 1 }
      (r.doc_id, h)
    }).toDF("doc_id", "afp60")
  }

  /** AUDIO NEAR-DUP PAIRS — [[phashDups]]' banded recipe over the
    * [[audioFingerprint]] signature: band equi-join candidates, exact
    * hamming ≤ `maxHamming` verification, pigeonhole-complete at
    * hamming ≤ nBands − 1. A one-byte payload tweak moves ≤ 1 energy
    * window = ≤ 2 adjacent delta bits, so the planted
    * [[mmTableWithTwins]] twins sit within hamming 2 of their
    * originals. Output: (doc_a, doc_b, hamming). */
  def audioFpDups(mm: Dataset[MMRecord], maxHamming: Int = MM_MAX_HAMMING,
                  nBands: Int = MM_BANDS): DataFrame =
    bandedHammingPairs(graft.CacheScope.persist(audioFingerprint(mm)),
      "afp60", maxHamming, nBands)

  /** FRAME-LEVEL DEDUP across records — the video twin of
    * [[TextOps.lineDedup]]: every frame's exact content (hex of its
    * bytes — the stub decode; a codec pipeline would hash the decoded
    * frame) keeps only its globally FIRST occurrence (lowest (doc_id,
    * frame_idx)), and each record reports how many of its frames were
    * seen before. The dedup is the skew-safe min(struct) aggregation —
    * a boilerplate frame repeated across a million clips stays one
    * mergeable group, never one window partition. Output: (doc_id,
    * n_frames, n_dup_frames). */
  def frameDedup(mm: Dataset[MMRecord]): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    val frames = mm.mapPartitions(_.flatMap { r =>
      Iterator.range(0, r.frames).map { f =>
        val bytes = r.payload.slice(f * r.frame_size, (f + 1) * r.frame_size)
        (r.doc_id, f.toLong, bytes.map(b => f"${b & 0xff}%02x").mkString)
      }
    }).toDF("doc_id", "frame_idx", "fhex")
    val firsts = frames.groupBy(col("fhex"))
      .agg(min(struct(col("doc_id"), col("frame_idx"))).as("first"))
    frames.join(firsts, Seq("fhex"))
      .withColumn("dup", struct(col("doc_id"), col("frame_idx")) =!= col("first"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_frames"))
  }

  /** SILENCE-SPAN DETECTION over the [[energyCurve]] — the VAD-style
    * trim step an audio pipeline runs before transcription/training:
    * maximal runs of consecutive windows whose energy (sum of squared
    * centered samples) falls below `threshold` merge into spans (the
    * gaps-and-islands cumulative-break pattern, per-record window
    * bounded by payload length). Output: one row per span — (doc_id,
    * span_start window index, n_wins, span_bytes). Integer arithmetic
    * end-to-end. */
  def silenceSpans(mm: Dataset[MMRecord], windowBytes: Int,
                   threshold: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    energyCurve(mm, windowBytes).filter(col("sum_sq") < threshold)
      .withColumn("grp", col("win_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("win_idx")).as("span_start"), count(lit(1)).as("n_wins"),
        sum(col("n_bytes")).as("span_bytes"))
      .select(col("doc_id"), col("span_start"), col("n_wins"), col("span_bytes"))
  }

  /** Resize stub: halve width/height until both fit `maxDim`, truncate the
    * payload to the implied byte budget (a codec would re-encode), emit
    * the new geometry + truncated-payload checksum. */
  def resize(mm: Dataset[MMRecord], maxDim: Int): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.mapPartitions(_.map { r =>
      var w = r.width; var h = r.height
      while (w > maxDim || h > maxDim) { w = (w + 1) / 2; h = (h + 1) / 2 }
      val budget = math.min(r.payload.length, w * h)
      val cut = r.payload.take(budget)
      (r.doc_id, w, h, budget.toLong, cut.map(b => (b & 0xff).toLong).sum)
    }).toDF("doc_id", "new_width", "new_height", "n_bytes", "checksum")
  }

  /** IMAGE NEAR-DUP CLUSTERS — the grouping pass on top of
    * [[phashDups]]' verified pairs: connected components over the
    * hamming-≤t graph label every record with its cluster (keep-min-id
    * representative = the cluster label, the [[graft.pipeline.DedupOps]]
    * convention); records with no near-dup are singletons under their
    * own id. This is the image twin of `dedup_components`: a 100 TB
    * image+text corpus dedups whole CLUSTERS (keep one per cluster),
    * not pairs. Output: (doc_id, cluster_id). */
  def phashClusters(mm: Dataset[MMRecord], maxHamming: Int = MM_MAX_HAMMING,
                    nBands: Int = MM_BANDS): DataFrame = {
    val pairs = phashDups(mm, maxHamming, nBands)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comps = GraphOps.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp_id"))
    mm.toDF.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp_id"), col("doc_id")).as("cluster_id"))
  }
}
