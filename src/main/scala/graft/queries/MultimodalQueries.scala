package graft.queries

import graft.Tables
import graft.pipeline.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verifiable queries for the multimodal-column operators. Payload bytes
  * are md5-derived, so the oracles recompute every byte as a hex pair —
  * the Spark side runs genuine binary processing over typed iterators,
  * the DuckDB side arithmetic on the hex encoding, and both must agree
  * exactly.
  */
object MultimodalQueries extends QueryModule {

  private def mm(s: SparkSession, d: String) =
    MultimodalOps.asRecords(MultimodalOps.mmTable(Tables.documents(s, d)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_sample" -> ((s, d) => MultimodalOps.frameSample(mm(s, d), stride = 2)),
    "mm_byte_histogram" -> ((s, d) => MultimodalOps.byteHistogram(mm(s, d))),
    "mm_resize" -> ((s, d) => MultimodalOps.resize(mm(s, d), maxDim = 16)),
    "mm_energy_curve" -> ((s, d) => MultimodalOps.energyCurve(mm(s, d), windowBytes = 24)),
    // dHash perceptual fingerprint over the stubbed decode — the
    // near-duplicate image signature (group/band downstream like simhash)
    "mm_phash" -> ((s, d) => MultimodalOps.perceptualHash(mm(s, d))),
    // banded near-dup pairs over the dHash with planted one-byte twins:
    // 6×10-bit band equi-join candidates, exact hamming ≤ 5 verification
    // (complete by pigeonhole at 6 bands) — the image twin of
    // dedup_minhash_lsh
    "mm_phash_dups" -> ((s, d) => MultimodalOps.phashDups(
      MultimodalOps.asRecords(
        MultimodalOps.mmTableWithTwins(Tables.documents(s, d))))),
    // frame-level exact dedup across records (twins share 3 of their 4
    // frames with the original — the boilerplate-frame keep-first pass)
    "mm_frame_dedup" -> ((s, d) => MultimodalOps.frameDedup(
      MultimodalOps.asRecords(
        MultimodalOps.mmTableWithTwins(Tables.documents(s, d))))),
    // VAD-style silence spans: runs of consecutive low-energy windows
    // (threshold ~p25 of the window-energy distribution)
    "mm_silence_spans" -> ((s, d) => MultimodalOps.silenceSpans(
      mm(s, d), windowBytes = 24, threshold = 100000L)),
    // image near-dup CLUSTERS: connected components over the verified
    // hamming pairs (the image twin of dedup_components) — whole-cluster
    // dedup, singletons under their own id
    "mm_phash_clusters" -> ((s, d) => MultimodalOps.phashClusters(
      MultimodalOps.asRecords(
        MultimodalOps.mmTableWithTwins(Tables.documents(s, d))))),
    // shot-boundary detection on video records: per consecutive frame
    // pair the L1 byte delta, cut where it exceeds the shared default
    // threshold (~median of the uniform-byte expectation)
    "mm_scene_cuts" -> ((s, d) =>
      MultimodalOps.sceneCuts(mm(s, d),
        threshold = MultimodalOps.SCENE_CUT_THRESHOLD)),

    // Chromaprint-style audio fingerprint: sign of successive
    // energy-window deltas over the stubbed decode → 60-bit signature
    "mm_audio_fp" -> ((s, d) => MultimodalOps.audioFingerprint(mm(s, d))),

    // audio near-dup pairs over the fingerprint with planted one-byte
    // twins — the audio twin of mm_phash_dups (band join + exact
    // hamming verify)
    "mm_audio_fp_dups" -> ((s, d) => MultimodalOps.audioFpDups(
      MultimodalOps.asRecords(
        MultimodalOps.mmTableWithTwins(Tables.documents(s, d))))))

  /** Shared oracle CTE: per (doc, byte-position) the payload byte value,
    * recomputed from the md5 hex chain. */
  private val bytesCte = {
    val totalBytes = MultimodalOps.FRAMES * MultimodalOps.FRAME_SIZE
    val hexConcat = (0 until totalBytes / 16) // md5 digest = 16 bytes
      .map(k => s"md5(CAST(doc_id AS VARCHAR) || ':$k')").mkString(" || ")
    s"""WITH mm AS (
       |  SELECT doc_id, $hexConcat AS hex,
       |    CAST(doc_id % 32 + 8 AS INT) AS width,
       |    CAST(doc_id % 24 + 6 AS INT) AS height
       |  FROM documents),
       |bytes AS (
       |  SELECT doc_id, ii.i AS i,
       |    CAST('0x' || substr(hex, 2*ii.i + 1, 2) AS INT) AS b
       |  FROM mm CROSS JOIN (SELECT UNNEST(range(0, $totalBytes)) AS i) ii)""".stripMargin
  }

  /** Shared oracle fragment for the banded near-dup pair contract
    * ([[MultimodalOps]]' private bandedHammingPairs): expects a CTE
    * `ph(doc_id, h)` in scope; produces `pairs(doc_a, doc_b, hamming)`
    * — exact-signature families starred to their min-doc
    * representative at hamming 0, representatives banded with the
    * hot-bucket cap, candidate pairs verified by exact hamming. Every
    * literal (band count, slice width, bucket cap, hamming cutoff)
    * interpolates the SAME MultimodalOps constants the Spark side
    * reads, so a tuning change cannot desync the oracle. */
  private val bandedPairsCtes: String = {
    val nBands = MultimodalOps.MM_BANDS
    val bits = 60 / nBands
    val width = 1L << bits
    val cap = MultimodalOps.MM_MAX_BAND_BUCKET
    val maxHam = MultimodalOps.MM_MAX_HAMMING
    s"""fam AS (SELECT h, MIN(doc_id) AS rep FROM ph GROUP BY h),
       |stars AS (SELECT f.rep AS doc_a, p.doc_id AS doc_b,
       |    CAST(0 AS BIGINT) AS hamming
       |  FROM ph p JOIN fam f ON p.h = f.h WHERE p.doc_id <> f.rep),
       |reps AS (SELECT rep AS doc_id, h FROM fam),
       |bnd AS (SELECT doc_id,
       |    CAST(bb.band AS VARCHAR) || ':' ||
       |      CAST((h >> (bb.band * $bits)) % $width AS VARCHAR) AS bkey
       |  FROM reps CROSS JOIN (SELECT UNNEST(range(0, $nBands)) AS band) bb),
       |bhot AS (SELECT bkey FROM bnd GROUP BY bkey HAVING COUNT(*) > $cap),
       |bndc AS (SELECT * FROM bnd WHERE bkey NOT IN (SELECT bkey FROM bhot)),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bndc a JOIN bndc b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |rpairs AS (SELECT doc_a, doc_b,
       |    CAST(bit_count(xor(pa.h, pb.h)) AS BIGINT) AS hamming
       |  FROM cands
       |  JOIN reps pa ON pa.doc_id = doc_a
       |  JOIN reps pb ON pb.doc_id = doc_b
       |  WHERE bit_count(xor(pa.h, pb.h)) <= $maxHam),
       |pairs AS (SELECT * FROM stars UNION ALL SELECT * FROM rpairs)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "mm_frame_sample" ->
      s"""$bytesCte
         |SELECT doc_id, CAST(i // 32 AS INT) AS frame_idx,
         |  COUNT(*) AS n_bytes, CAST(SUM(b) AS BIGINT) AS checksum
         |FROM bytes WHERE (i // 32) % 2 = 0
         |GROUP BY doc_id, i // 32""".stripMargin,

    "mm_byte_histogram" ->
      s"""$bytesCte,
         |counts AS (SELECT doc_id, b // 16 AS bucket, COUNT(*) AS n
         |           FROM bytes GROUP BY doc_id, b // 16)
         |SELECT m.doc_id, CAST(bk.bucket AS INT) AS bucket,
         |  COALESCE(c.n, 0) AS n
         |FROM mm m
         |CROSS JOIN (SELECT UNNEST(range(0, 16)) AS bucket) bk
         |LEFT JOIN counts c ON c.doc_id = m.doc_id AND c.bucket = bk.bucket""".stripMargin,

    "mm_energy_curve" ->
      s"""$bytesCte
         |SELECT doc_id, CAST(i // 24 AS BIGINT) AS win_idx,
         |  COUNT(*) AS n_bytes,
         |  CAST(SUM((b - 128) * (b - 128)) AS BIGINT) AS sum_sq
         |FROM bytes GROUP BY doc_id, i // 24""".stripMargin,

    // NOTE: two unrolled halving layers suffice because the synthesis
    // bounds width at 39 (doc_id % 32 + 8) and maxDim is 16; widen the
    // unroll if either bound changes.
    "mm_resize" ->
      s"""$bytesCte,
         |g1 AS (SELECT doc_id, width, height,
         |    CASE WHEN width > 16 OR height > 16 THEN (width + 1) // 2
         |         ELSE width END AS w1,
         |    CASE WHEN width > 16 OR height > 16 THEN (height + 1) // 2
         |         ELSE height END AS h1
         |  FROM mm),
         |g2 AS (SELECT doc_id,
         |    CASE WHEN w1 > 16 OR h1 > 16 THEN (w1 + 1) // 2 ELSE w1 END AS w2,
         |    CASE WHEN w1 > 16 OR h1 > 16 THEN (h1 + 1) // 2 ELSE h1 END AS h2
         |  FROM g1),
         |geo AS (SELECT doc_id, CAST(w2 AS INT) AS new_width,
         |    CAST(h2 AS INT) AS new_height,
         |    least(128, w2 * h2) AS budget
         |  FROM g2)
         |SELECT geo.doc_id, new_width, new_height,
         |  CAST(budget AS BIGINT) AS n_bytes, CAST(SUM(b) AS BIGINT) AS checksum
         |FROM geo JOIN bytes ON bytes.doc_id = geo.doc_id AND bytes.i < budget
         |GROUP BY geo.doc_id, new_width, new_height, budget""".stripMargin,

    // bit i = [byte_i < byte_{i+1}], i < 60 — joined as a self-pair on
    // adjacent byte positions, summed as exact powers of two
    "mm_phash" ->
      s"""$bytesCte
         |SELECT a.doc_id,
         |  CAST(COALESCE(SUM(CASE WHEN a.b < c.b
         |    THEN CAST(1 AS BIGINT) << a.i ELSE 0 END), 0) AS BIGINT) AS phash60
         |FROM bytes a JOIN bytes c
         |  ON a.doc_id = c.doc_id AND c.i = a.i + 1 AND a.i < 60
         |GROUP BY a.doc_id""".stripMargin,

    // twins replayed as byte arithmetic (one byte +1 at pos doc_id%61),
    // dHash per record, 6×10-bit band equi-join, xor+bit_count verify
    "mm_phash_clusters" ->
      s"""${bytesCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |twb AS (SELECT doc_id + 1000000000 AS doc_id, i, nb AS b FROM (
         |    SELECT doc_id, i,
         |      CASE WHEN i = doc_id % 61 THEN (b + 1) % 256 ELSE b END AS nb
         |    FROM bytes WHERE doc_id % 50 = 0)),
         |allb AS (SELECT doc_id, i, b FROM bytes
         |  UNION ALL SELECT doc_id, i, b FROM twb),
         |ph AS (SELECT a.doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN a.b < c.b
         |      THEN CAST(1 AS BIGINT) << a.i ELSE 0 END), 0) AS BIGINT) AS h
         |  FROM allb a JOIN allb c
         |    ON a.doc_id = c.doc_id AND c.i = a.i + 1 AND a.i < 60
         |  GROUP BY a.doc_id),
         |$bandedPairsCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |comps AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         |ids AS (SELECT doc_id FROM ph)
         |SELECT ids.doc_id, COALESCE(c.cluster_id, ids.doc_id) AS cluster_id
         |FROM ids LEFT JOIN comps c ON ids.doc_id = c.doc_id""".stripMargin,

    "mm_phash_dups" ->
      s"""$bytesCte,
         |twb AS (SELECT doc_id + 1000000000 AS doc_id, i, nb AS b FROM (
         |    SELECT doc_id, i,
         |      CASE WHEN i = doc_id % 61 THEN (b + 1) % 256 ELSE b END AS nb
         |    FROM bytes WHERE doc_id % 50 = 0)),
         |allb AS (SELECT doc_id, i, b FROM bytes
         |  UNION ALL SELECT doc_id, i, b FROM twb),
         |ph AS (SELECT a.doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN a.b < c.b
         |      THEN CAST(1 AS BIGINT) << a.i ELSE 0 END), 0) AS BIGINT) AS h
         |  FROM allb a JOIN allb c
         |    ON a.doc_id = c.doc_id AND c.i = a.i + 1 AND a.i < 60
         |  GROUP BY a.doc_id),
         |$bandedPairsCtes
         |SELECT doc_a, doc_b, hamming FROM pairs""".stripMargin,

    // frames rebuilt as 64-hex-char strings over base ∪ twins; first
    // occurrence per content ranked by (doc_id, frame_idx)
    "mm_frame_dedup" ->
      s"""$bytesCte,
         |twb AS (SELECT doc_id + 1000000000 AS doc_id, i, nb AS b FROM (
         |    SELECT doc_id, i,
         |      CASE WHEN i = doc_id % 61 THEN (b + 1) % 256 ELSE b END AS nb
         |    FROM bytes WHERE doc_id % 50 = 0)),
         |allb AS (SELECT doc_id, i, b FROM bytes
         |  UNION ALL SELECT doc_id, i, b FROM twb),
         |fr AS (SELECT doc_id, CAST(i // 32 AS BIGINT) AS frame_idx,
         |    string_agg(lower(lpad(hex(b), 2, '0')), '' ORDER BY i) AS fhex
         |  FROM allb GROUP BY doc_id, i // 32),
         |mk AS (SELECT doc_id, frame_idx, row_number() OVER (
         |    PARTITION BY fhex ORDER BY doc_id, frame_idx) AS rn FROM fr)
         |SELECT doc_id, COUNT(*) AS n_frames,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_frames
         |FROM mk GROUP BY doc_id""".stripMargin,

    // window energies below the threshold merged into maximal runs
    // (gaps-and-islands, the dedup_spans pattern)
    "mm_silence_spans" ->
      s"""$bytesCte,
         |w AS (SELECT doc_id, CAST(i // 24 AS BIGINT) AS win_idx,
         |    COUNT(*) AS nb,
         |    CAST(SUM((b - 128) * (b - 128)) AS BIGINT) AS ss
         |  FROM bytes GROUP BY doc_id, i // 24),
         |s AS (SELECT * FROM w WHERE ss < 100000),
         |mk AS (SELECT doc_id, win_idx, nb, win_idx - row_number() OVER (
         |    PARTITION BY doc_id ORDER BY win_idx) AS grp FROM s)
         |SELECT doc_id, MIN(win_idx) AS span_start,
         |  CAST(COUNT(*) AS BIGINT) AS n_wins,
         |  CAST(SUM(nb) AS BIGINT) AS span_bytes
         |FROM mk GROUP BY doc_id, grp""".stripMargin,

    // audio-only energy windows (AUDIO_FP_WIN bytes each), bit w =
    // [e(w+1) > e(w)] summed as exact powers of two — the afp60 replay
    "mm_audio_fp" -> {
      val w = MultimodalOps.AUDIO_FP_WIN
      val audioMod = MultimodalOps.KINDS.indexOf("audio")
      s"""$bytesCte,
         |en AS (SELECT doc_id, CAST(i // $w AS BIGINT) AS w,
         |    CAST(SUM((b - 128) * (b - 128)) AS BIGINT) AS e
         |  FROM bytes WHERE doc_id % 3 = $audioMod
         |  GROUP BY doc_id, i // $w)
         |SELECT a.doc_id,
         |  CAST(COALESCE(SUM(CASE WHEN n.e > a.e
         |    THEN CAST(1 AS BIGINT) << a.w ELSE 0 END), 0) AS BIGINT) AS afp60
         |FROM en a JOIN en n
         |  ON n.doc_id = a.doc_id AND n.w = a.w + 1 AND a.w < 60
         |GROUP BY a.doc_id""".stripMargin
    },

    // twins filtered to AUDIO ORIGINALS before the +1e9 id shift (the
    // shift changes doc_id mod 3, but twins inherit the ORIGINAL's
    // kind), then the afp60 replay + band join + hamming verify
    "mm_audio_fp_dups" -> {
      val w = MultimodalOps.AUDIO_FP_WIN
      val audioMod = MultimodalOps.KINDS.indexOf("audio")
      s"""$bytesCte,
         |twb AS (SELECT doc_id + 1000000000 AS doc_id, i, nb AS b FROM (
         |    SELECT doc_id, i,
         |      CASE WHEN i = doc_id % 61 THEN (b + 1) % 256 ELSE b END AS nb
         |    FROM bytes WHERE doc_id % 50 = 0 AND doc_id % 3 = $audioMod)),
         |allb AS (SELECT doc_id, i, b FROM bytes
         |    WHERE doc_id % 3 = $audioMod
         |  UNION ALL SELECT doc_id, i, b FROM twb),
         |en AS (SELECT doc_id, CAST(i // $w AS BIGINT) AS w,
         |    CAST(SUM((b - 128) * (b - 128)) AS BIGINT) AS e
         |  FROM allb GROUP BY doc_id, i // $w),
         |ph AS (SELECT a.doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN n.e > a.e
         |      THEN CAST(1 AS BIGINT) << a.w ELSE 0 END), 0) AS BIGINT) AS h
         |  FROM en a JOIN en n
         |    ON n.doc_id = a.doc_id AND n.w = a.w + 1 AND a.w < 60
         |  GROUP BY a.doc_id),
         |$bandedPairsCtes
         |SELECT doc_a, doc_b, hamming FROM pairs""".stripMargin
    },

    // consecutive-frame L1 deltas joined on (doc, byte offset ± frame
    // size); every stub-geometry literal (frame size, video-kind
    // modulus, threshold) interpolates the SHARED MultimodalOps
    // constants the Spark side reads, so a geometry change can't desync
    // the oracle silently. The self-join reads bytes twice —
    // materialize a video-only copy so the md5 byte expansion runs
    // once, not per join side
    "mm_scene_cuts" -> {
      val fs = MultimodalOps.FRAME_SIZE
      val videoMod = MultimodalOps.KINDS.indexOf("video")
      val thr = MultimodalOps.SCENE_CUT_THRESHOLD
      s"""$bytesCte,
         |vb AS MATERIALIZED (SELECT doc_id, i, b FROM bytes
         |  WHERE doc_id % 3 = $videoMod)
         |SELECT a.doc_id, CAST(a.i // $fs AS INT) AS frame_idx,
         |  CAST(SUM(abs(a.b - p.b)) AS BIGINT) AS l1_delta,
         |  CAST(SUM(abs(a.b - p.b)) AS BIGINT) > $thr AS is_cut
         |FROM vb a JOIN vb p
         |  ON a.doc_id = p.doc_id AND p.i = a.i - $fs
         |GROUP BY a.doc_id, a.i // $fs""".stripMargin
    })
}
