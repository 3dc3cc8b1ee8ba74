package graft.queries

import graft.Tables
import graft.pipeline.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verifiable similarity-search queries over the `embeddings` table:
  * brute-force exact cosine top-k (the ANN baseline), IVF-style
  * cell-restricted top-k, and hyperplane-sign LSH near-pair mining. All
  * scoring runs on integer-quantized vectors so the DuckDB oracles are
  * bit-exact (see [[graft.pipeline.VectorOps]]).
  */
object VectorQueries extends QueryModule {

  /** DuckDB spelling of the quantized vector of `embedding`. */
  private[queries] val qvSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** DuckDB cosine of two quantized vector columns (each norm cast to
    * DOUBLE before the product — mirrors [[VectorOps.cosinePre]]'s
    * overflow-safe shape). */
  private def cosSql(a: String, b: String) =
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS DOUBLE)
       | / sqrt(CAST(list_sum(list_transform($a, x -> x * x)) AS DOUBLE)
       |        * CAST(list_sum(list_transform($b, x -> x * x)) AS DOUBLE))""".stripMargin

  /** DuckDB spelling of the 64-bit hyperplane-sign signature (matches
    * [[VectorOps.hyperplanes]]: ±1 from md5("h,i") parity, i 0-based). */
  private val sigSql =
    """list_transform(range(0, 64), h -> CASE WHEN list_sum(
      |  list_transform(range(1, len(qv) + 1), i -> qv[i] *
      |    ((CAST('0x' || substr(md5(CAST(h AS VARCHAR) || ',' ||
      |        CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) % 2) * 2 - 1)))
      |  >= 0 THEN 1 ELSE 0 END)""".stripMargin

  /** DuckDB replay of [[VectorOps.kmeansCentroids]] + the nprobe search
    * candidates, as a chain of CTEs generated per Lloyd iteration
    * (iterations are FIXED, so unrolling sidesteps recursive-CTE
    * aggregation limits). Expects a `q(vec_id, qv)` CTE in scope;
    * produces `kcand(q_id, qqv, vec_id, qv)`.
    *
    * Exactness contract (mirrors the Scala fit): integer centroids via
    * sign-split half-away-from-zero rounding in pure BIGINT arithmetic,
    * squared-distance comparisons all BIGINT, ties to the lowest cid,
    * empty clusters carry the previous centroid forward. */
  private[queries] def kmeansCtes(iters: Int = 4, fitPred: String = "TRUE",
                                  drawSalt: Option[String] = None,
                                  px: String = ""): String = {
    def dist(qv: String, c: String) =
      s"list_sum(list_transform(range(1, len($qv) + 1), j -> ($qv[j] - $c[j]) * ($qv[j] - $c[j])))"
    // fit-sample order: lowest vec_ids by default; lowest md5 draws for
    // the hash-sampled (corpus-representative) fit — VectorOps.vecDraw
    val sampSel = drawSalt match {
      case None => s"${px}samp AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE $fitPred ORDER BY vec_id LIMIT 512),"
      case Some(salt) =>
        s"""${px}samp AS MATERIALIZED (SELECT vec_id, qv,
           |    CAST('0x' || substr(md5('$salt:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
           |      % 1000000 AS dr
           |  FROM q WHERE $fitPred ORDER BY dr, vec_id LIMIT 512),""".stripMargin
    }
    val sampOrd = drawSalt.map(_ => "dr, vec_id").getOrElse("vec_id")
    val head =
      s"""${px}par AS (SELECT GREATEST(1, LEAST((COUNT(*) + 49) // 50, 512)) AS k
         |       FROM embeddings WHERE $fitPred),
         |$sampSel
         |${px}cent0 AS (SELECT CAST(row_number() OVER (ORDER BY $sampOrd) - 1 AS BIGINT) AS cid,
         |            qv AS cent
         |          FROM ${px}samp QUALIFY row_number() OVER (ORDER BY $sampOrd) <= (SELECT k FROM ${px}par)),""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""${px}asg$i AS MATERIALIZED (SELECT vec_id, qv, cid FROM (
         |  SELECT s.vec_id, s.qv, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id ORDER BY ${dist("s.qv", "c.cent")}, c.cid) AS rn
         |  FROM ${px}samp s CROSS JOIN ${px}cent$i c) WHERE rn = 1),
         |${px}cmp$i AS (SELECT cid, j,
         |    CASE WHEN SUM(qv[j + 1]) >= 0
         |      THEN (2 * SUM(qv[j + 1]) + COUNT(*)) // (2 * COUNT(*))
         |      ELSE -((-2 * SUM(qv[j + 1]) + COUNT(*)) // (2 * COUNT(*))) END AS r
         |  FROM ${px}asg$i CROSS JOIN (SELECT UNNEST(range(0, 64)) AS j) jj
         |  GROUP BY cid, j),
         |${px}cent${i + 1} AS MATERIALIZED (SELECT c.cid, COALESCE(n.cent, c.cent) AS cent
         |  FROM ${px}cent$i c LEFT JOIN (SELECT cid, list(CAST(r AS BIGINT) ORDER BY j) AS cent
         |                           FROM ${px}cmp$i GROUP BY cid) n ON c.cid = n.cid),""".stripMargin
    }.mkString("\n")
    val tail =
      s"""${px}ranked AS MATERIALIZED (SELECT q.vec_id, q.qv, c.cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dist("q.qv", "c.cent")}, c.cid) AS rn
         |  FROM q CROSS JOIN ${px}cent$iters c),
         |${px}np AS (SELECT LEAST(16, GREATEST(1, (k + 4) // 5)) AS nprobe FROM ${px}par),
         |${px}kcells AS MATERIALIZED (SELECT vec_id, qv, cid FROM ${px}ranked WHERE rn = 1),
         |${px}kprobes AS (SELECT vec_id AS q_id, qv AS qqv, cid FROM ${px}ranked
         |            WHERE rn <= (SELECT nprobe FROM ${px}np)),
         |${px}kcand AS MATERIALIZED (SELECT p.q_id, p.qqv, c.vec_id, c.qv
         |          FROM ${px}kprobes p JOIN ${px}kcells c ON p.cid = c.cid AND c.vec_id <> p.q_id)""".stripMargin
    head + "\n" + steps + "\n" + tail
  }

  /** DuckDB replay of the 4 product-quantizer codebooks
    * ([[VectorOps.pqCentroids]]: 16-dim subspaces, k = 16, 2 Lloyd
    * iterations on the 512-sample) + code assignment + the per-query
    * ADC lookup tables. Expects `q(vec_id, qv)`; produces
    * `codes(vec_id, m, code)` and `dt(q_id, m, code, d)`. */
  private def pqCtes(mSub: Int = 4, sub: Int = 16, kC: Int = 16,
                     iters: Int = 2, qMax: Int = 10): String = {
    def dist(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a) + 1), j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))"
    val subs = (0 until mSub).map { s =>
      val (lo, hi) = (s * sub + 1, (s + 1) * sub)
      val head =
        s"""s${s}samp AS (SELECT vec_id, list_slice(qv, $lo, $hi) AS sv
           |  FROM q ORDER BY vec_id LIMIT 512),
           |s${s}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
           |    sv AS cent FROM s${s}samp
           |  QUALIFY row_number() OVER (ORDER BY vec_id) <= $kC),""".stripMargin
      val steps = (0 until iters).map { i =>
        s"""s${s}asg$i AS (SELECT vec_id, sv, cid FROM (
           |  SELECT t.vec_id, t.sv, c.cid,
           |    row_number() OVER (PARTITION BY t.vec_id
           |      ORDER BY ${dist("t.sv", "c.cent")}, c.cid) AS rn
           |  FROM s${s}samp t CROSS JOIN s${s}c$i c) WHERE rn = 1),
           |s${s}cmp$i AS (SELECT cid, j,
           |    CASE WHEN SUM(sv[j + 1]) >= 0
           |      THEN (2 * SUM(sv[j + 1]) + COUNT(*)) // (2 * COUNT(*))
           |      ELSE -((-2 * SUM(sv[j + 1]) + COUNT(*)) // (2 * COUNT(*))) END AS r
           |  FROM s${s}asg$i CROSS JOIN (SELECT UNNEST(range(0, $sub)) AS j) jj
           |  GROUP BY cid, j),
           |s${s}c${i + 1} AS (SELECT c.cid, COALESCE(n.cent, c.cent) AS cent
           |  FROM s${s}c$i c LEFT JOIN (SELECT cid, list(CAST(r AS BIGINT) ORDER BY j) AS cent
           |                             FROM s${s}cmp$i GROUP BY cid) n ON c.cid = n.cid),""".stripMargin
      }.mkString("\n")
      val tail =
        s"""s${s}code AS (SELECT vec_id, $s AS m, cid AS code FROM (
           |  SELECT t.vec_id, c.cid,
           |    row_number() OVER (PARTITION BY t.vec_id
           |      ORDER BY ${dist("t.sv", "c.cent")}, c.cid) AS rn
           |  FROM (SELECT vec_id, list_slice(qv, $lo, $hi) AS sv FROM q) t
           |  CROSS JOIN s${s}c$iters c) WHERE rn = 1),
           |s${s}dt AS (SELECT t.vec_id AS q_id, $s AS m, c.cid AS code,
           |    ${dist("t.sv", "c.cent")} AS d
           |  FROM (SELECT vec_id, list_slice(qv, $lo, $hi) AS sv FROM q
           |        WHERE vec_id < $qMax) t
           |  CROSS JOIN s${s}c$iters c),""".stripMargin
      head + "\n" + steps + "\n" + tail
    }.mkString("\n")
    val unions =
      s"""codes AS (${(0 until mSub).map(s => s"SELECT * FROM s${s}code").mkString(" UNION ALL ")}),
         |dt AS (${(0 until mSub).map(s => s"SELECT * FROM s${s}dt").mkString(" UNION ALL ")})""".stripMargin
    subs + "\n" + unions
  }

  /** DuckDB flat-PQ ADC top-3 (shared tail for pq_topk and the recall
    * diagnostic's approximate leg). */
  private lazy val pqTopkSql: String =
    s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
       |${pqCtes()},
       |ad AS (SELECT dt.q_id, codes.vec_id, CAST(SUM(d) AS BIGINT) AS adist
       |  FROM codes JOIN dt ON codes.m = dt.m AND codes.code = dt.code
       |  WHERE codes.vec_id <> dt.q_id
       |  GROUP BY dt.q_id, codes.vec_id)
       |SELECT q_id, vec_id, adist,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY adist, vec_id) AS INT) AS rk
       |FROM ad QUALIFY rk <= 3""".stripMargin

  /** DuckDB k-means nprobe top-3 with the Lloyd fit restricted to
    * `fitPred` rows (assignment/serve always over the full corpus) —
    * shared by the direct search, the persisted-index round-trip, and
    * the incremental-append serve, which must all produce identical
    * results for their respective fit scopes. */
  private def kmeansTopkSqlOn(fitPred: String,
                              drawSalt: Option[String] = None): String =
    s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
       |${kmeansCtes(4, fitPred, drawSalt)},
       |sc AS (SELECT q_id, vec_id, ${cosSql("qqv", "qv")} AS c FROM kcand),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM sc)
       |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
       |FROM r WHERE rk <= 3""".stripMargin

  private lazy val kmeansTopkSql: String = kmeansTopkSqlOn("TRUE")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> ((s, d) =>
      VectorOps.bruteForceTopK(Tables.embeddings(s, d), queryMaxId = 10, k = 5)),
    // LAION-construction CLIP alignment gate: even/odd vec_id =
    // image/caption pair, exact quantized cosine, threshold verdict
    // (0.20 is corpus-calibrated — the synthetic embeddings are
    // noisier than CLIP space, so LAION's published ViT-B/32 cut of
    // 0.28 would keep almost nothing; the plan is threshold-free)
    "mm_clip_gate" -> ((s, d) =>
      VectorOps.clipGate(Tables.embeddings(s, d), threshold = 0.20)),
    "ann_ivf_topk" -> ((s, d) =>
      VectorOps.ivfTopK(Tables.embeddings(s, d), k = 3)),
    "ann_lsh_pairs" -> ((s, d) =>
      VectorOps.lshPairs(Tables.embeddings(s, d), threshold = 0.4)),
    // threshold 0.4 = this corpus's "near" (synthetic embeddings top out
    // at cosine ~0.48; a production near-dup pass would use ~0.9 — the
    // plan is threshold-independent)
    "dedup_embedding_cosine" -> ((s, d) =>
      VectorOps.embCosineDups(Tables.embeddings(s, d), threshold = 0.4)),
    // NOTE the measured recall on THIS corpus is low (~0.13 mean): the
    // synthetic embeddings are unclustered noise (max pairwise cosine
    // ~0.48), so single-cell search misses most "neighbors" — which is
    // precisely what this diagnostic exists to reveal before deploying
    // an IVF index; clustered production embeddings score far higher.
    "ann_recall" -> ((s, d) =>
      VectorOps.ivfRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    // multi-probe: own cell + every hamming-1 cell — (b+1)x bounded
    // fanout buying back the neighbors single-cell search loses
    "ann_ivf_multiprobe" -> ((s, d) =>
      VectorOps.ivfMultiprobeTopK(Tables.embeddings(s, d), k = 3)),
    "ann_multiprobe_recall" -> ((s, d) =>
      VectorOps.multiprobeRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    // graded companion to recall@k: WHERE the exact top-1 lands in the
    // multiprobe ranking (reciprocal rank — rational, unlike nDCG's log)
    "ann_multiprobe_mrr" -> ((s, d) =>
      VectorOps.multiprobeMrr(Tables.embeddings(s, d), queryMaxId = 10)),
    // k-means coarse quantizer: driver Lloyd fit on a deterministic
    // sample (integer-exact, replayed by the oracle CTE-for-CTE),
    // nprobe nearest cells per query — the cell strategy that follows
    // the data where sign-hyperplanes can't
    "ann_ivf_kmeans" -> ((s, d) =>
      VectorOps.ivfKmeansTopK(Tables.embeddings(s, d), k = 3)),
    // same search with the HASH-SAMPLED fit: the 512-vector Lloyd sample
    // is the lowest md5 draws instead of the lowest vec_ids — the
    // corpus-representative choice at production scale, where an id
    // prefix is ingest-order biased (oldest shard / single source)
    "ann_ivf_kmeans_hashfit" -> ((s, d) =>
      VectorOps.ivfKmeansTopK(Tables.embeddings(s, d), k = 3,
        hashSalt = Some("kfit"))),
    "ann_kmeans_recall" -> ((s, d) =>
      VectorOps.kmeansRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    // build -> persist -> reload -> serve; equals ann_ivf_kmeans exactly,
    // and the oracle states that equality
    "ann_index_roundtrip" -> ((s, d) =>
      VectorOps.ivfKmeansServe(Tables.embeddings(s, d), k = 3,
        indexDir = s"target/graft-tmp/ivf_index_${new java.io.File(d).getName}")),
    // incremental add: index built over the oldest 4/5 of the corpus,
    // the newest fifth assigned to the PERSISTED centroids (no refit),
    // serve over the extended index — equals a from-scratch assignment
    // of the full corpus at the base-fitted centroids, which is what
    // the oracle replays
    "ann_index_append" -> ((s, d) => {
      import org.apache.spark.sql.functions.max
      val emb = Tables.embeddings(s, d)
      val split = (emb.agg(max("vec_id")).head.getLong(0) * 4) / 5
      VectorOps.ivfKmeansAppend(emb, split, k = 3,
        indexDir = s"target/graft-tmp/ivf_append_${new java.io.File(d).getName}")
    }),
    // component-wise mean embedding per label (mean pooling)
    "emb_label_centroids" -> ((s, d) =>
      VectorOps.labelCentroids(Tables.embeddings(s, d))),
    // SemDeDup: k-means-cell-restricted cosine dedup — semantic
    // duplicates that share no n-grams, candidates bounded by cell width
    "semdedup" -> ((s, d) =>
      VectorOps.semDedup(Tables.embeddings(s, d), threshold = 0.4)),
    // int8 compression diagnostics: per-vector min/max quantization with
    // exact integer reconstruction-error stats (no shuffle)
    "emb_int8_quant" -> ((s, d) =>
      VectorOps.int8QuantStats(Tables.embeddings(s, d))),
    // semantic decontamination: train vectors within cosine 0.4 of any
    // label-0 ("benchmark") vector — the embedding twin of
    // decontam_overlap, LSH-banded candidates, never all-pairs
    "decontam_semantic" -> ((s, d) =>
      VectorOps.semanticContamination(Tables.embeddings(s, d),
        org.apache.spark.sql.functions.col("label") === 0, threshold = 0.4)),
    // the banding's honesty metric: recall vs the exact train×eval
    // cosine pairs, both legs on the deterministic md5 half-sample
    // (the dedup_lsh_recall_sampled pattern on the embedding side)
    "decontam_semantic_recall" -> ((s, d) =>
      VectorOps.semanticContaminationRecall(Tables.embeddings(s, d),
        org.apache.spark.sql.functions.col("label") === 0, threshold = 0.4,
        sampleFrac = 0.5)),
    // flat-PQ ADC search: 4×16-dim codebooks (driver Lloyd fit replayed
    // by the oracle per subspace), codes map-side, approximate distance
    // = sum of m table lookups via one (m, code) equi-join
    "ann_pq_topk" -> ((s, d) =>
      VectorOps.pqTopK(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    "ann_pq_recall" -> ((s, d) =>
      VectorOps.pqRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    // the production composition: coarse-cell probe filter + ADC codes
    "ann_ivfpq_topk" -> ((s, d) =>
      VectorOps.ivfPqTopK(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),
    // vector-side composition: drop cosine near-duplicates (keep each
    // cluster's min-id representative), then serve multi-probe top-3 over
    // the deduplicated index — the build-then-search path a production
    // embedding store runs. Cell width re-derives from the SURVIVOR count.
    "embedding_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dups = VectorOps.embCosineDups(emb, threshold = 0.4)
        .select(col("vec_id"))
      VectorOps.ivfMultiprobeTopK(
        graft.CacheScope.persist(emb.join(dups, Seq("vec_id"), "left_anti")), k = 3)
    }),

    // Johnson-Lindenstrauss ±1 random projection to 16 longs per vector
    // (the un-thresholded LSH kernel): exact integer sums, the coarse
    // representation a billion-vector first-pass search scans
    "emb_rp16" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      VectorOps.rawProjections(Tables.embeddings(s, d), nPlanes = 16)
        .select(col("vec_id"), col("h").cast("long").as("h"), col("p"))
    }),

    // recall@3 of the 16-long RP-sketch scan vs exact cosine — the JL
    // distortion made measurable (companion to emb_rp16)
    "ann_rp_recall" -> ((s, d) =>
      VectorOps.rpRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),

    // matryoshka truncation eval: cosine over the first 16 of 64
    // components vs the full-dimension exact ranking (the serve-shorter
    // decision metric for MRL-style embeddings)
    "ann_matryoshka_recall" -> ((s, d) =>
      VectorOps.matryoshkaRecall(Tables.embeddings(s, d), queryMaxId = 10,
        k = 3, prefixDim = 16)),

    // SQ8 scalar-quantization eval: every component one byte against the
    // corpus per-dimension range, scored by the exact-integer decoded
    // midpoint cosine — the 4×-compression point on the accuracy curve
    // next to PQ and matryoshka
    "ann_sq8_recall" -> ((s, d) =>
      VectorOps.sq8Recall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),

    // isolation-forest outlier screen: 8 md5-deterministic trees fitted
    // on adaptive subsamples, every vector's path-length sum scored
    // row-local under the broadcast cut table; the DuckDB oracle replays
    // the WHOLE fit as one recursive CTE (min/max node stats are
    // order-free — no pinned folds needed, unlike the GBT replay)
    "emb_iso_outliers" -> ((s, d) =>
      VectorOps.isoOutliers(Tables.embeddings(s, d), topK = 20)),

    // contrastive hard-negative mining: per anchor, top-5 most-similar
    // DIFFERENT-label vectors under a 0.95 near-dup ceiling
    "emb_hard_negatives" -> ((s, d) =>
      VectorOps.hardNegatives(Tables.embeddings(s, d), queryMaxId = 10, k = 5)),

    // mislabeled-example screen: top-2 per label by z-scored distance to
    // the label centroid (exact-integer centroid arithmetic)
    "emb_label_outliers" -> ((s, d) =>
      VectorOps.labelOutliers(Tables.embeddings(s, d), perLabel = 2)),

    // top principal direction of the embedding cloud: exact fixed-point
    // power iteration over the integer-centered covariance (the
    // dominant-direction / ABTT axis). Fit-small/score-distributed —
    // covariance is two map-side-aggregated scans, the 8-round
    // iteration runs on the bounded 64×64 driver matrix; the fit is
    // shared session-wide via PcaFixture (the BpeFixture contract), so
    // the loading/projection/ABTT trio scans the corpus once, not 3×
    "emb_pca_power" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.pcaLoadingFrom(emb, graft.pipeline.PcaFixture.fitted(emb, d, 8))
    }),

    // per-vector projection onto that direction — the curriculum /
    // outlier axis; (μ, v) ship as plan literals, zero shuffles
    "emb_pca_project" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.pcaProjectWith(emb, graft.pipeline.PcaFixture.fitted(emb, d, 8))
    }),

    // same-cell kNN adjacency (top-3 cosine neighbors within each
    // k-means cell) — the graph semantic clustering starts from;
    // Σ|cell|² pair work, never all-pairs
    "ann_knn_graph" -> ((s, d) =>
      VectorOps.knnGraph(Tables.embeddings(s, d), k = 3)),

    // mutual-kNN connected components: semantic cluster id per vector,
    // singletons under their own id
    "semantic_clusters" -> ((s, d) =>
      VectorOps.semanticClusters(Tables.embeddings(s, d), k = 3)),

    // HNSW-shape graph serving: deterministic beam search over the kNN
    // graph — md5-drawn entry points, fixed rounds/beam, per-query state
    // independent of corpus size
    "ann_graph_topk" -> ((s, d) =>
      VectorOps.graphBeamTopK(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),

    // recall@k of the graph serve vs the exact baseline — does the
    // beam reach the true neighborhood from the fixed entries?
    "ann_graph_recall" -> ((s, d) =>
      VectorOps.graphBeamRecall(Tables.embeddings(s, d), queryMaxId = 10, k = 3)),

    // CCMatrix-style bitext mining: per en doc its best de counterpart
    // by the Artetxe-Schwenk ratio margin (cosine over the mean of both
    // directions' 4-NN cosines) — hub suppression plain thresholds lack
    "bitext_margin_pairs" -> ((s, d) =>
      VectorOps.bitextMarginPairs(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // the stricter forward-backward intersection: keep a pair only when
    // each side is the other's best margin (precision over recall)
    "bitext_mutual_pairs" -> ((s, d) =>
      VectorOps.bitextMutualPairs(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // the serve-mode ROUTER: measured recall@3 of the IVF cell scan vs
    // the graph beam at three budgets + cell-size evidence + per-mode
    // visit bounds -> the pick (cheapest mode within 0.05 of the best
    // recall) — closes the "which serve do I call" gap of the r15
    // recall table
    "ann_serve_mode" -> ((s, d) =>
      VectorOps.serveModeDiagnostic(Tables.embeddings(s, d),
        queryMaxId = 10, k = 3)),

    // the banded miner's honesty leg: end-to-end mined-pair recall of
    // the production banded candidates vs the exhaustive brute scorer
    // (the dedup_lsh_recall convention — bitext was the one banded
    // family without one)
    "bitext_banded_recall" -> ((s, d) =>
      VectorOps.bitextBandedRecall(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // the cells-mode honesty leg: candidates from nprobe k-means cells
    // instead of sign bands — the measured fix for the 0.10 banded
    // recall on weakly-clustered corpora (IVF cells follow the data
    // where fixed hyperplanes can't)
    "bitext_cell_recall" -> ((s, d) =>
      VectorOps.bitextCellRecall(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // the bitext router CONSUMED: both honesty legs measured, the
    // cheapest candidate mode within 0.05 recall of the best mines the
    // corpus, and the pick ships on every row (the annServeAuto rule
    // applied to the miner's candidate source)
    "bitext_auto" -> ((s, d) =>
      VectorOps.bitextAutoPairs(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // the router AT SCALE: diagnostic legs (brute reference included) on
    // the md5 half-sample — the documented escape hatch as code — then
    // the picked mode mines the FULL corpus
    "bitext_auto_sampled" -> ((s, d) =>
      VectorOps.bitextAutoPairsSampled(Tables.embeddings(s, d),
        Tables.documents(s, d).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")))),

    // graph index persistence round-trip: edges + entry layer written to
    // parquet, reloaded, beam-served — equals ann_graph_topk exactly;
    // the steady state pays only the O(1)-per-query search
    "ann_graph_roundtrip" -> ((s, d) =>
      VectorOps.graphBeamServe(Tables.embeddings(s, d), queryMaxId = 10, k = 3,
        indexDir = s"target/graft-tmp/graph_index_${new java.io.File(d).getName}")),

    // the persisted serve-router pick, oracle-checked end-to-end: the
    // persist call runs the full diagnostic over fresh artifacts and
    // writes artifacts + pick; the RETURNED frame is the steady-state
    // annServeCached serve — reading the pick from disk and paying the
    // picked search alone — projected to the (q_id, vec_id, rk) schema
    // every mode shares (score columns differ per mode by design)
    "ann_serve_pick_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val dir = s"target/graft-tmp/serve_pick_${new java.io.File(d).getName}"
      VectorOps.annServePersist(emb, queryMaxId = 10, k = 3, indexDir = dir)
      VectorOps.annServeCached(emb, queryMaxId = 10, k = 3, indexDir = dir)
        .select(col("q_id"), col("vec_id"), col("rk"))
    }),

    // incremental graph maintenance: base graph over the oldest 4/5,
    // the newest fifth assigned to the FROZEN centroids with edges
    // against the extended cell membership (base adjacency stays as
    // built until the periodic rebuild) — O(batch * cell) append work
    "ann_graph_append" -> ((s, d) => {
      import org.apache.spark.sql.functions.max
      val emb = Tables.embeddings(s, d)
      val split = (emb.agg(max("vec_id")).head.getLong(0) * 4) / 5
      VectorOps.graphBeamAppend(emb, split, queryMaxId = 10, k = 3,
        indexDir = s"target/graft-tmp/graph_append_${new java.io.File(d).getName}")
    }),

    // the rebuild trigger the append families were missing: appended
    // fraction + measured recall delta (appended index vs a fresh
    // rebuild, the GraphAnnSpec stale-vs-fresh comparison productized)
    // -> rebuild verdict
    "ann_index_staleness" -> ((s, d) => {
      import org.apache.spark.sql.functions.max
      val emb = Tables.embeddings(s, d)
      val split = (emb.agg(max("vec_id")).head.getLong(0) * 4) / 5
      VectorOps.graphIndexStaleness(emb, split, queryMaxId = 10, k = 3,
        indexDir = s"target/graft-tmp/graph_stale_${new java.io.File(d).getName}")
    }),

    // DCLM-style rebalancing: at most 8 survivors per semantic cluster,
    // deterministic md5 draw, two-phase bucketed top-k
    "sample_cluster_balanced" -> ((s, d) =>
      VectorOps.clusterBalancedSample(Tables.embeddings(s, d), quota = 8)),

    // all-but-the-top isotropy correction: the corpus with its dominant
    // direction removed, long form — the fitted (μ, v, ‖v‖²) ship as
    // plan literals, zero shuffles
    "emb_abtt" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.abttResidualsWith(emb, graft.pipeline.PcaFixture.fitted(emb, d, 8))
    }),

    // did the correction work? along-axis variance before/after ABTT +
    // reduction ratio, decimal-exact moments, one map-side pass
    "emb_abtt_isotropy" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      VectorOps.abttIsotropyWith(emb, graft.pipeline.PcaFixture.fitted(emb, d, 8))
    }),

    // embedding drift monitor: per label, cosine between the two md5
    // corpus halves' mean embeddings (cosine of exact component sums)
    "emb_centroid_drift" -> ((s, d) =>
      VectorOps.centroidDrift(Tables.embeddings(s, d))))

  /** DuckDB replay of [[VectorOps.pcaFit]]: integer means, centered
    * covariance round(S/N) via vec_id self-join, then `iters` unrolled
    * power-iteration CTEs — u = C·v in exact integers, renormalized by
    * round(u/max|u|·1e6) (both engines round half away from zero).
    * Produces `e(vec_id, i, x)`, `mu(i, m)` and `v{iters}(i, v)`. */
  private def pcaCtes(iters: Int = 8): String = {
    // every stage MATERIALIZED: the iteration CTEs reference their
    // predecessors 3× apiece, and DuckDB inlines non-materialized CTEs —
    // without the hint the v8 tree re-evaluates cov (and re-opens the
    // parquet) O(3^iters) times
    val rounds = (1 to iters).map { k =>
      s"""u$k AS MATERIALIZED (SELECT c.i AS i, CAST(SUM(c.c * p.v) AS BIGINT) AS u
         |  FROM cov c JOIN v${k - 1} p ON c.j = p.i GROUP BY c.i),
         |m$k AS MATERIALIZED (SELECT MAX(ABS(u)) AS m FROM u$k),
         |v$k AS MATERIALIZED (SELECT u$k.i AS i, CASE WHEN (SELECT m FROM m$k) = 0 THEN p.v
         |  ELSE CAST(round(CAST(u AS DOUBLE) / (SELECT m FROM m$k) * 1000000) AS BIGINT)
         |  END AS v FROM u$k JOIN v${k - 1} p ON u$k.i = p.i)""".stripMargin
    }.mkString(",\n")
    s"""q AS MATERIALIZED (SELECT vec_id, $qvSql AS qv FROM embeddings),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM q),
       |e AS MATERIALIZED (SELECT vec_id, u.i AS i, u.x AS x FROM (SELECT vec_id,
       |  unnest(list_transform(range(1, len(qv) + 1),
       |    j -> {'i': j - 1, 'x': qv[j]})) AS u FROM q)),
       |mu AS MATERIALIZED (SELECT i, CAST(round(CAST(SUM(x) AS DOUBLE)
       |  / (SELECT n FROM nn)) AS BIGINT) AS m FROM e GROUP BY i),
       |ce AS MATERIALIZED (SELECT vec_id, e.i AS i, x - m AS cx FROM e JOIN mu ON e.i = mu.i),
       |cov AS MATERIALIZED (SELECT a.i AS i, b.i AS j, CAST(round(CAST(SUM(a.cx * b.cx) AS DOUBLE)
       |  / (SELECT n FROM nn)) AS BIGINT) AS c
       |  FROM ce a JOIN ce b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
       |v0 AS MATERIALIZED (SELECT i, CAST(1000000 AS BIGINT) AS v FROM mu),
       |$rounds""".stripMargin
  }

  /** Shared oracle body for the same-cell kNN edges, parameterized on
    * the src/dst scopes (predicates over `a.vec_id` / `b.vec_id`) so
    * the incremental append can replay its asymmetric edge set: expects
    * `q` + [[kmeansCtes]] in scope, produces `<name>(src, dst, c, rk)`. */
  private[queries] def knnCtesAs(name: String, srcPred: String = "TRUE",
                                 dstPred: String = "TRUE",
                                 cells: String = "kcells"): String =
    s"""${name}pr AS MATERIALIZED (SELECT a.vec_id AS src, a.qv AS qa, b.vec_id AS dst, b.qv AS qb
       |  FROM $cells a JOIN $cells b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |  WHERE ($srcPred) AND ($dstPred)),
       |${name}sc AS MATERIALIZED (SELECT src, dst, ${cosSql("qa", "qb")} AS c FROM ${name}pr),
       |$name AS MATERIALIZED (SELECT * FROM (SELECT src, dst, c, row_number() OVER (
       |    PARTITION BY src ORDER BY c DESC, dst) AS rk FROM ${name}sc)
       |  WHERE rk <= 3)""".stripMargin

  /** The full-scope instance (the plain kNN graph), kept under the CTE
    * names the carried oracles interpolate. */
  private val knnCtes: String =
    knnCtesAs("knn").replace("knnpr", "pr").replace("knnsc", "sc")

  /** Unrolled replay of [[VectorOps.graphBeamTopK]]'s beam search over
    * the `knn` edge CTE: entry layer = the min-md5('gent')-draw vector
    * per k-means cell, then [[VectorOps.GraphBeamRounds]] rounds of
    * (top-beam by cosine → expand via edges → union, distinct,
    * re-score). Expects `q` + [[kmeansCtes]] + an edge CTE `ed(src,
    * dst)` in scope (the plain serve passes the full [[knnCtes]] graph,
    * the append its base ∪ appended union);
    * produces the final scored visited set `s<rounds>(q_id, vec_id, c)`
    * for queries vec_id < 10. Every constant interpolates from the
    * VectorOps vals so a retune can't desync engine and oracle. */
  /** Budget-independent head of the beam replay: the query set, the
    * per-cell entry layer, and the scored entry frontier `<hpx>s0` —
    * prefixed so the staleness oracle can run two index instances in
    * one statement. */
  private def graphBeamHeadCtesP(hpx: String, cells: String): String =
    s"""${hpx}qry AS MATERIALIZED (SELECT vec_id AS q_id, qv AS qqv FROM q WHERE vec_id < 10),
       |${hpx}ent AS MATERIALIZED (SELECT vec_id FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY cid ORDER BY
       |      ${TextQueries.hex60Sql("md5('gent:' || CAST(vec_id AS VARCHAR))")}
       |        % 1000000, vec_id) AS re
       |  FROM $cells) WHERE re = 1),
       |${hpx}v0 AS (SELECT q_id, vec_id FROM ${hpx}qry CROSS JOIN ${hpx}ent),
       |${hpx}s0 AS MATERIALIZED (SELECT v.q_id, v.vec_id, ${cosSql("qry.qqv", "q.qv")} AS c
       |  FROM ${hpx}v0 v JOIN ${hpx}qry qry ON v.q_id = qry.q_id
       |  JOIN q ON v.vec_id = q.vec_id)""".stripMargin

  private val graphBeamHeadCtes: String = graphBeamHeadCtesP("", "kcells")

  /** The per-budget round chains over [[graphBeamHeadCtes]]' shared
    * `s0`, CTE names prefixed with `px` so the serve-mode router can
    * replay several (beam, rounds) budgets in one statement; ends in
    * `<px>s<rounds>`. */
  private def graphBeamRoundCtes(px: String, beam: Int, rounds: Int,
                                 hpx: String = "", ed: String = "ed"): String = {
    def sN(i: Int) = if (i == 0) s"${hpx}s0" else s"${px}s$i"
    (1 to rounds).map { i =>
      s"""${px}b$i AS MATERIALIZED (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM ${sN(i - 1)}) WHERE rk <= $beam),
         |${px}v$i AS MATERIALIZED (SELECT DISTINCT q_id, vec_id FROM (
         |  SELECT q_id, vec_id FROM ${sN(i - 1)}
         |  UNION ALL
         |  SELECT b.q_id, ed.dst AS vec_id FROM ${px}b$i b JOIN $ed ed ON b.vec_id = ed.src)),
         |${sN(i)} AS MATERIALIZED (SELECT v.q_id, v.vec_id, ${cosSql("qry.qqv", "q.qv")} AS c
         |  FROM ${px}v$i v JOIN ${hpx}qry qry ON v.q_id = qry.q_id
         |  JOIN q ON v.vec_id = q.vec_id)""".stripMargin
    }.mkString(",\n")
  }

  /** The default-budget instance under the CTE names the carried
    * graph oracles interpolate (`s${GraphBeamRounds}` etc.). */
  private val graphBeamCtes: String =
    s"""$graphBeamHeadCtes,
       |${graphBeamRoundCtes("", VectorOps.GraphBeamWidth, VectorOps.GraphBeamRounds)}""".stripMargin

  /** Shared bitext BASE chain — the language-labelled vector frames plus
    * the capped sign-LSH band index (the banded candidate source).
    * `bpx` prefixes every CTE name and `pred` restricts the vector
    * source, so the sampled-router oracle can instantiate a half-corpus
    * base next to the full one in one statement. */
  private def bitextBaseCtesP(bpx: String, pred: String = "TRUE"): String =
    s"""${bpx}q AS (SELECT vec_id, $qvSql AS qv FROM embeddings WHERE $pred),
       |${bpx}l AS (SELECT d.doc_id AS vec_id, d.lang, q.qv
       |      FROM documents d JOIN ${bpx}q q ON d.doc_id = q.vec_id),
       |${bpx}aa AS (SELECT vec_id AS doc_a, qv AS qa FROM ${bpx}l WHERE lang = 'en'),
       |${bpx}bb AS (SELECT vec_id AS doc_b, qv AS qb FROM ${bpx}l WHERE lang = 'de'),
       |${bpx}sg AS (SELECT vec_id, qv, $sigSql AS sig FROM ${bpx}q),
       |${bpx}vb0 AS (
       |  SELECT vec_id, unnest(list_transform(range(0, 8), b ->
       |    md5(CAST(b AS VARCHAR) || '|' ||
       |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
       |  FROM ${bpx}sg),
       |${bpx}vbh AS (SELECT bkey FROM ${bpx}vb0 GROUP BY bkey
       |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
       |${bpx}bands AS (SELECT * FROM ${bpx}vb0
       |  WHERE bkey NOT IN (SELECT bkey FROM ${bpx}vbh))""".stripMargin

  private val bitextBaseCtes: String = bitextBaseCtesP("")

  /** Parameterized bitext-margin score chain over [[bitextBaseCtes]],
    * ending in `<px>m(doc_a, doc_b, cr, margin)` — the one-best miner
    * and the mutual filter differ only in their rank tails; the recall
    * diagnostic instantiates it twice (banded + brute) under distinct
    * prefixes. Interpolates the same [[VectorOps.BitextNnK]] the Spark
    * side reads. */
  private def bitextScoreCtes(px: String, banded: Boolean): String =
    bitextScoreCtesMode(px, if (banded) "banded" else "brute")

  /** `mode` ∈ banded|cells|brute — mirrors
    * [[VectorOps.bitextCandidates]]; `"cells"` expects a [[kmeansCtes]]
    * instance (`<kpx>kprobes`/`<kpx>kcells`) in scope; `bpx` selects the
    * [[bitextBaseCtesP]] instance the chain reads. */
  private def bitextScoreCtesMode(px: String, mode: String,
                                  bpx: String = "", kpx: String = ""): String = {
    val k = VectorOps.BitextNnK
    val cand = mode match {
      case "banded" =>
        s"""${px}cand AS (SELECT DISTINCT ba.vec_id AS doc_a, bb2.vec_id AS doc_b
           |  FROM ${bpx}bands ba JOIN ${bpx}bands bb2 ON ba.bkey = bb2.bkey
           |  WHERE ba.vec_id IN (SELECT doc_a FROM ${bpx}aa)
           |    AND bb2.vec_id IN (SELECT doc_b FROM ${bpx}bb))""".stripMargin
      case "cells" =>
        s"""${px}cand AS (SELECT DISTINCT p.q_id AS doc_a, c.vec_id AS doc_b
           |  FROM ${kpx}kprobes p JOIN ${kpx}kcells c ON p.cid = c.cid
           |  WHERE p.q_id IN (SELECT doc_a FROM ${bpx}aa)
           |    AND c.vec_id IN (SELECT doc_b FROM ${bpx}bb))""".stripMargin
      case _ =>
        s"""${px}cand AS (SELECT aa.doc_a, bb.doc_b
           |  FROM ${bpx}aa aa CROSS JOIN ${bpx}bb bb)""".stripMargin
    }
    s"""$cand,
       |${px}p AS (SELECT ${px}cand.doc_a, ${px}cand.doc_b,
       |    ROUND(${cosSql("qa", "qb")} + 1e-9, 6) AS cr
       |  FROM ${px}cand JOIN ${bpx}aa aa ON ${px}cand.doc_a = aa.doc_a
       |  JOIN ${bpx}bb bb ON ${px}cand.doc_b = bb.doc_b),
       |${px}ra AS (SELECT doc_a, CAST(SUM(CAST(cr AS DECIMAL(20,6))) AS DOUBLE) AS sa
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
       |          ORDER BY cr DESC, doc_b) AS rk FROM ${px}p)
       |  WHERE rk <= $k GROUP BY doc_a),
       |${px}rb AS (SELECT doc_b, CAST(SUM(CAST(cr AS DECIMAL(20,6))) AS DOUBLE) AS sb
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_b
       |          ORDER BY cr DESC, doc_a) AS rk FROM ${px}p)
       |  WHERE rk <= $k GROUP BY doc_b),
       |${px}m AS (SELECT ${px}p.doc_a, ${px}p.doc_b, cr,
       |    ROUND(cr * ${2 * k} / (sa + sb) + 1e-9, 6) AS margin
       |  FROM ${px}p JOIN ${px}ra ON ${px}p.doc_a = ${px}ra.doc_a
       |  JOIN ${px}rb ON ${px}p.doc_b = ${px}rb.doc_b)""".stripMargin
  }

  /** The banded instance under the CTE names the carried oracles use. */
  private val bitextCtes: String =
    s"""$bitextBaseCtes,
       |${bitextScoreCtes("", banded = true)}""".stripMargin

  /** Shared oracle chain `sc2(vec_id, cluster_id)` — the full
    * semantic-clusters spelling (kmeans cells → same-cell kNN → mutual
    * edges → reachability closure), factored for the cluster-consumer
    * oracles. Must be opened with `WITH RECURSIVE`. */
  private val semClusterCtes: String =
    s"""q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
       |${kmeansCtes(4)},
       |$knnCtes,
       |mut AS (SELECT a.src AS a, a.dst AS b FROM knn a
       |        JOIN knn b ON a.src = b.dst AND a.dst = b.src),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM mut) n
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN mut e ON r.b = e.a),
       |comps AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
       |sc2 AS (SELECT q.vec_id, COALESCE(c.cluster_id, q.vec_id) AS cluster_id
       |  FROM q LEFT JOIN comps c ON q.vec_id = c.vec_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    // same pairing, same quantized-cosine kernel, same 6-dp rounding
    // before the threshold compare
    "mm_clip_gate" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv, label,
         |    vec_id // 2 AS pair_id, vec_id % 2 AS side FROM embeddings),
         |a AS (SELECT pair_id, qv AS qa, label FROM q WHERE side = 0),
         |b AS (SELECT pair_id, qv AS qb FROM q WHERE side = 1),
         |sc AS (SELECT pair_id, label,
         |    ROUND(${cosSql("qa", "qb")} + 1e-9, 6) AS clip_sim
         |  FROM a JOIN b USING (pair_id))
         |SELECT pair_id, label, clip_sim, clip_sim >= 0.20 AS keep
         |FROM sc""".stripMargin,

    "emb_centroid_drift" ->
      s"""WITH q AS (SELECT vec_id, label, $qvSql AS qv,
         |    CAST('0x' || substr(md5('half:' || CAST(vec_id AS VARCHAR)), 1, 15)
         |      AS BIGINT) % 1000000 < 500000 AS ha
         |  FROM embeddings),
         |e AS (SELECT label, ha, u.i AS i, u.x AS x FROM (SELECT label, ha,
         |  unnest(list_transform(range(1, len(qv) + 1),
         |    j -> {'i': j - 1, 'x': qv[j]})) AS u FROM q)),
         |s AS (SELECT label, ha, i, SUM(x) AS s, COUNT(*) AS n
         |      FROM e GROUP BY 1, 2, 3),
         |jj AS (SELECT a.label, a.i, a.s AS sa, b.s AS sb, a.n AS n_a, b.n AS n_b
         |  FROM (SELECT * FROM s WHERE ha) a
         |  JOIN (SELECT * FROM s WHERE NOT ha) b
         |    ON a.label = b.label AND a.i = b.i)
         |SELECT label, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         |  ROUND(CAST(SUM(CAST(sa AS HUGEINT) * sb) AS DOUBLE)
         |    / sqrt(CAST(SUM(CAST(sa AS HUGEINT) * sa) AS DOUBLE)
         |           * CAST(SUM(CAST(sb AS HUGEINT) * sb) AS DOUBLE)) + 1e-9, 6)
         |    AS centroid_cosine
         |FROM jj GROUP BY label""".stripMargin,

    "ann_knn_graph" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4)},
         |$knnCtes
         |SELECT src, dst, ROUND(c + 1e-9, 6) AS cosine, rk FROM knn""".stripMargin,

    "ann_graph_topk" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4)},
         |$knnCtes,
         |ed AS (SELECT src, dst FROM knn),
         |$graphBeamCtes
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM s${VectorOps.GraphBeamRounds} WHERE vec_id <> q_id)
         |WHERE rk <= 3""".stripMargin,

    "ann_graph_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4)},
         |$knnCtes,
         |ed AS (SELECT src, dst FROM knn),
         |$graphBeamCtes,
         |approx AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM s${VectorOps.GraphBeamRounds} WHERE vec_id <> q_id)
         |  WHERE rk <= 3),
         |esc AS (SELECT q_id, q.vec_id AS vec_id, ${cosSql("qqv", "qv")} AS c
         |        FROM qry CROSS JOIN q WHERE q.vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    // one statement replays every leg: the shared kmeans/knn/beam-head
    // chains, one prefixed round chain per budget, the PQ codebook/ADC
    // and SQ8 coding chains, the brute baseline, the nprobe cell scan,
    // and the pick logic (cheapest BYTES bound among recall-eligible
    // modes — the memory-bound currency) — every constant interpolates
    // from the VectorOps vals the Spark side reads
    "ann_serve_mode" -> serveModeOracle._1,

    // the persisted-pick roundtrip replayed: the SAME chain decides the
    // pick, and the output is the PICKED mode's serve rows
    // (q_id, vec_id, rk) — what the Spark side returns from
    // annServeCached after annServePersist wrote artifacts + pick
    "ann_serve_pick_roundtrip" -> serveModeOracle._2,

    // pairs scored once, both direction's 4-NN sums as exact
    // DECIMAL(20,6) aggregations of the 6-dp-rounded cosines, one
    // multiply+divide margin — identical IEEE inputs on both engines
    "bitext_margin_pairs" ->
      s"""WITH $bitextCtes
         |SELECT doc_a, doc_b, cr AS cosine, margin
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
         |        ORDER BY margin DESC, doc_b) AS rk FROM m)
         |WHERE rk = 1 AND margin >= ${VectorOps.BitextMarginThreshold}""".stripMargin,

    // both legs instantiated from ONE parameterized chain (banded under
    // "bd", brute under "br"), mined one-best sets intersected
    "bitext_banded_recall" -> {
      val t = VectorOps.BitextMarginThreshold
      s"""WITH $bitextBaseCtes,
         |${bitextScoreCtes("bd", banded = true)},
         |${bitextScoreCtes("br", banded = false)},
         |bdmined AS (SELECT doc_a, doc_b
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
         |          ORDER BY margin DESC, doc_b) AS rk FROM bdm)
         |  WHERE rk = 1 AND margin >= $t),
         |brmined AS (SELECT doc_a, doc_b
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
         |          ORDER BY margin DESC, doc_b) AS rk FROM brm)
         |  WHERE rk = 1 AND margin >= $t),
         |h AS (SELECT COUNT(*) AS hits FROM brmined JOIN bdmined
         |        USING (doc_a, doc_b)),
         |ch AS (SELECT COUNT(*) AS cand_hits FROM brmined JOIN bdcand
         |        USING (doc_a, doc_b))
         |SELECT (SELECT COUNT(*) FROM brmined) AS brute_pairs,
         |  (SELECT COUNT(*) FROM bdmined) AS banded_pairs,
         |  hits,
         |  CASE WHEN (SELECT COUNT(*) FROM brmined) = 0 THEN 1.0
         |    ELSE ROUND(CAST(hits AS DOUBLE)
         |      / (SELECT COUNT(*) FROM brmined) + 1e-9, 4) END AS recall,
         |  cand_hits,
         |  CASE WHEN (SELECT COUNT(*) FROM brmined) = 0 THEN 1.0
         |    ELSE ROUND(CAST(cand_hits AS DOUBLE)
         |      / (SELECT COUNT(*) FROM brmined) + 1e-9, 4) END AS cand_recall
         |FROM h CROSS JOIN ch""".stripMargin
    },

    // cells-mode recall leg: the kmeans chain joins the bitext base,
    // candidates = kprobes x kcells restricted cross-language
    "bitext_cell_recall" -> {
      val t = VectorOps.BitextMarginThreshold
      s"""WITH $bitextBaseCtes,
         |${kmeansCtes(4)},
         |${bitextScoreCtesMode("cl", "cells")},
         |${bitextScoreCtesMode("br", "brute")},
         |clmined AS (SELECT doc_a, doc_b
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
         |          ORDER BY margin DESC, doc_b) AS rk FROM clm)
         |  WHERE rk = 1 AND margin >= $t),
         |brmined AS (SELECT doc_a, doc_b
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
         |          ORDER BY margin DESC, doc_b) AS rk FROM brm)
         |  WHERE rk = 1 AND margin >= $t),
         |h AS (SELECT COUNT(*) AS hits FROM brmined JOIN clmined
         |        USING (doc_a, doc_b)),
         |ch AS (SELECT COUNT(*) AS cand_hits FROM brmined JOIN clcand
         |        USING (doc_a, doc_b))
         |SELECT (SELECT COUNT(*) FROM brmined) AS brute_pairs,
         |  (SELECT COUNT(*) FROM clmined) AS cell_pairs,
         |  hits,
         |  CASE WHEN (SELECT COUNT(*) FROM brmined) = 0 THEN 1.0
         |    ELSE ROUND(CAST(hits AS DOUBLE)
         |      / (SELECT COUNT(*) FROM brmined) + 1e-9, 4) END AS recall,
         |  cand_hits,
         |  CASE WHEN (SELECT COUNT(*) FROM brmined) = 0 THEN 1.0
         |    ELSE ROUND(CAST(cand_hits AS DOUBLE)
         |      / (SELECT COUNT(*) FROM brmined) + 1e-9, 4) END AS cand_recall
         |FROM h CROSS JOIN ch""".stripMargin
    },

    // the router replayed whole: all three candidate chains in one
    // statement, both modes' recall vs the shared brute baseline, the
    // measured candidate counts as the cost currency, the pick (cheapest
    // eligible within the shared slack), and the picked mode's mined
    // pairs as the result — every constant interpolates from the
    // VectorOps vals the Spark side reads
    "bitext_auto" -> {
      val t = VectorOps.BitextMarginThreshold
      val slack = VectorOps.AnnServeRecallSlack
      def mined(px: String) =
        s"""${px}mined AS (SELECT doc_a, doc_b, cr, margin
           |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
           |          ORDER BY margin DESC, doc_b) AS rk FROM ${px}m)
           |  WHERE rk = 1 AND margin >= $t)""".stripMargin
      def statRow(mode: String, px: String) =
        s"""SELECT '$mode' AS mode,
           |  (SELECT COUNT(*) FROM ${px}cand) AS cand_pairs,
           |  CASE WHEN (SELECT COUNT(*) FROM brmined) = 0 THEN 1.0
           |    ELSE ROUND(CAST((SELECT COUNT(*) FROM brmined JOIN ${px}mined
           |        USING (doc_a, doc_b)) AS DOUBLE)
           |      / (SELECT COUNT(*) FROM brmined) + 1e-9, 4) END AS recall""".stripMargin
      s"""WITH $bitextBaseCtes,
         |${kmeansCtes(4)},
         |${bitextScoreCtesMode("bd", "banded")},
         |${bitextScoreCtesMode("cl", "cells")},
         |${bitextScoreCtesMode("br", "brute")},
         |${mined("bd")},
         |${mined("cl")},
         |${mined("br")},
         |stats AS (${statRow("banded", "bd")}
         |  UNION ALL
         |  ${statRow("cells", "cl")}),
         |pick AS (SELECT mode FROM stats
         |  WHERE recall >= (SELECT MAX(recall) FROM stats) - $slack
         |  ORDER BY cand_pairs, mode LIMIT 1)
         |SELECT doc_a, doc_b, cr AS cosine, margin, 'banded' AS mode
         |FROM bdmined WHERE (SELECT mode FROM pick) = 'banded'
         |UNION ALL
         |SELECT doc_a, doc_b, cr AS cosine, margin, 'cells' AS mode
         |FROM clmined WHERE (SELECT mode FROM pick) = 'cells'""".stripMargin
    },

    // the sampled router replayed whole: the half-corpus base + its
    // three candidate chains and recall stats drive the pick; the FULL
    // base + the picked mode's full chain mine the output — two base
    // instances, two kmeans instances, one statement
    "bitext_auto_sampled" -> {
      val t = VectorOps.BitextMarginThreshold
      val slack = VectorOps.AnnServeRecallSlack
      val samplePred =
        s"${TextQueries.hex60Sql(s"md5('${VectorOps.BitextSampleSalt}:' || CAST(vec_id AS VARCHAR))")} % 1000000 < 500000"
      def mined(px: String) =
        s"""${px}mined AS (SELECT doc_a, doc_b, cr, margin
           |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
           |          ORDER BY margin DESC, doc_b) AS rk FROM ${px}m)
           |  WHERE rk = 1 AND margin >= $t)""".stripMargin
      def statRow(mode: String, px: String) =
        s"""SELECT '$mode' AS mode,
           |  (SELECT COUNT(*) FROM ${px}cand) AS cand_pairs,
           |  CASE WHEN (SELECT COUNT(*) FROM sbrmined) = 0 THEN 1.0
           |    ELSE ROUND(CAST((SELECT COUNT(*) FROM sbrmined JOIN ${px}mined
           |        USING (doc_a, doc_b)) AS DOUBLE)
           |      / (SELECT COUNT(*) FROM sbrmined) + 1e-9, 4) END AS recall""".stripMargin
      s"""WITH ${bitextBaseCtesP("s", samplePred)},
         |${bitextBaseCtesP("")},
         |${kmeansCtes(4, samplePred, px = "sk")},
         |${kmeansCtes(4)},
         |${bitextScoreCtesMode("sbd", "banded", bpx = "s")},
         |${bitextScoreCtesMode("scl", "cells", bpx = "s", kpx = "sk")},
         |${bitextScoreCtesMode("sbr", "brute", bpx = "s")},
         |${mined("sbd")},
         |${mined("scl")},
         |${mined("sbr")},
         |stats AS (${statRow("banded", "sbd")}
         |  UNION ALL
         |  ${statRow("cells", "scl")}),
         |pick AS (SELECT mode FROM stats
         |  WHERE recall >= (SELECT MAX(recall) FROM stats) - $slack
         |  ORDER BY cand_pairs, mode LIMIT 1),
         |${bitextScoreCtesMode("bd", "banded")},
         |${bitextScoreCtesMode("cl", "cells")},
         |${mined("bd")},
         |${mined("cl")}
         |SELECT doc_a, doc_b, cr AS cosine, margin, 'banded' AS mode
         |FROM bdmined WHERE (SELECT mode FROM pick) = 'banded'
         |UNION ALL
         |SELECT doc_a, doc_b, cr AS cosine, margin, 'cells' AS mode
         |FROM clmined WHERE (SELECT mode FROM pick) = 'cells'""".stripMargin
    },

    // the intersection filter: both directions' rank-1 in one pass
    "bitext_mutual_pairs" ->
      s"""WITH $bitextCtes
         |SELECT doc_a, doc_b, cr AS cosine, margin
         |FROM (SELECT *,
         |    row_number() OVER (PARTITION BY doc_a
         |      ORDER BY margin DESC, doc_b) AS rka,
         |    row_number() OVER (PARTITION BY doc_b
         |      ORDER BY margin DESC, doc_a) AS rkb FROM m)
         |WHERE rka = 1 AND rkb = 1
         |  AND margin >= ${VectorOps.BitextMarginThreshold}""".stripMargin,

    // the asymmetric append edge set, replayed: base-base edges at the
    // base-fitted cells, new-node edges against the full extended
    // membership, entry layer over everything
    "ann_graph_append" -> {
      val split = "(SELECT (MAX(vec_id) * 4) // 5 FROM embeddings)"
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4, s"vec_id < $split")},
         |${knnCtesAs("knno", s"a.vec_id < $split", s"b.vec_id < $split")},
         |${knnCtesAs("knnn", s"a.vec_id >= $split")},
         |ed AS (SELECT src, dst FROM knno
         |  UNION ALL SELECT src, dst FROM knnn
         |  UNION ALL SELECT dst AS src, src AS dst FROM knnn),
         |$graphBeamCtes
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM s${VectorOps.GraphBeamRounds} WHERE vec_id <> q_id)
         |WHERE rk <= 3""".stripMargin
    },

    // two full index instances in one statement — the appended one
    // (base fit, asymmetric edges + back-links: prefix a) and the fresh
    // rebuild (full fit: prefix f) — each beam-served, both scored
    // against the same brute baseline, folded into the verdict row
    "ann_index_staleness" -> {
      val split = "(SELECT (MAX(vec_id) * 4) // 5 FROM embeddings)"
      val (w, r) = (VectorOps.GraphBeamWidth, VectorOps.GraphBeamRounds)
      def mined(px: String) =
        s"""SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
           |  FROM ${px}s$r WHERE vec_id <> q_id) WHERE rk <= 3""".stripMargin
      def recallOf(px: String, out: String) =
        s"""SELECT ROUND(CAST((SELECT COUNT(*) FROM exact JOIN (${mined(px)}) a
           |      USING (q_id, vec_id)) AS DOUBLE)
           |    / ((SELECT COUNT(DISTINCT q_id) FROM exact) * 3) + 1e-9, 4)
           |    AS $out""".stripMargin
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4, s"vec_id < $split", px = "a")},
         |${knnCtesAs("aknno", s"a.vec_id < $split", s"b.vec_id < $split",
            cells = "akcells")},
         |${knnCtesAs("aknnn", s"a.vec_id >= $split", cells = "akcells")},
         |aed AS MATERIALIZED (SELECT src, dst FROM aknno
         |  UNION ALL SELECT src, dst FROM aknnn
         |  UNION ALL SELECT dst AS src, src AS dst FROM aknnn),
         |${graphBeamHeadCtesP("a", "akcells")},
         |${graphBeamRoundCtes("ag", w, r, hpx = "a", ed = "aed")},
         |${kmeansCtes(4, px = "f")},
         |${knnCtesAs("fknn", cells = "fkcells")},
         |fed AS MATERIALIZED (SELECT src, dst FROM fknn),
         |${graphBeamHeadCtesP("f", "fkcells")},
         |${graphBeamRoundCtes("fg", w, r, hpx = "f", ed = "fed")},
         |esc AS (SELECT qry.q_id, q.vec_id AS vec_id, ${cosSql("qry.qqv", "q.qv")} AS c
         |        FROM fqry qry CROSS JOIN q WHERE q.vec_id <> qry.q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS MATERIALIZED (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |cnt AS (SELECT COUNT(*) FILTER (vec_id < $split) AS n_base,
         |        COUNT(*) FILTER (vec_id >= $split) AS n_appended FROM q),
         |ra AS (${recallOf("ag", "recall_appended")}),
         |rf AS (${recallOf("fg", "recall_fresh")})
         |SELECT n_base, n_appended,
         |  ROUND(CAST(n_appended AS DOUBLE) / (n_base + n_appended) + 1e-9, 4)
         |    AS appended_frac,
         |  recall_appended, recall_fresh,
         |  ROUND(recall_fresh - recall_appended + 1e-9, 4) AS recall_delta,
         |  (ROUND(CAST(n_appended AS DOUBLE) / (n_base + n_appended) + 1e-9, 4)
         |     >= ${VectorOps.AnnRebuildAppendedFrac}
         |   OR ROUND(recall_fresh - recall_appended + 1e-9, 4)
         |     >= ${VectorOps.AnnRebuildRecallDelta}) AS rebuild
         |FROM cnt CROSS JOIN ra CROSS JOIN rf""".stripMargin
    },

    // build -> persist -> reload -> serve equals the direct beam search
    // exactly, and the oracle states that equality (the
    // ann_index_roundtrip convention)
    "ann_graph_roundtrip" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4)},
         |$knnCtes,
         |ed AS (SELECT src, dst FROM knn),
         |$graphBeamCtes
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM s${VectorOps.GraphBeamRounds} WHERE vec_id <> q_id)
         |WHERE rk <= 3""".stripMargin,

    "semantic_clusters" ->
      s"""WITH RECURSIVE $semClusterCtes
         |SELECT vec_id, cluster_id FROM sc2""".stripMargin,

    // per-cluster deterministic draw ranked in ONE window (fine for an
    // oracle; the engine's two-phase bucketed top-k must equal it)
    "sample_cluster_balanced" ->
      s"""WITH RECURSIVE $semClusterCtes,
         |sz AS (SELECT cluster_id, COUNT(*) AS cluster_n FROM sc2 GROUP BY 1),
         |dr AS (SELECT vec_id, cluster_id,
         |    ${TextQueries.hex60Sql("md5('cbs:' || CAST(vec_id AS VARCHAR))")}
         |      % 1000000 AS draw
         |  FROM sc2),
         |rk AS (SELECT vec_id, cluster_id,
         |    CAST(row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY draw, vec_id) AS BIGINT) AS rk
         |  FROM dr)
         |SELECT rk.vec_id, rk.cluster_id, sz.cluster_n, rk.rk
         |FROM rk JOIN sz USING (cluster_id) WHERE rk <= 8""".stripMargin,

    "emb_pca_power" ->
      s"""WITH ${pcaCtes(8)}
         |SELECT i, v AS loading FROM v8""".stripMargin,

    "emb_pca_project" ->
      s"""WITH ${pcaCtes(8)}
         |SELECT vec_id, CAST(SUM((e.x - mu.m) * vv.v) AS BIGINT) AS pc1
         |FROM e JOIN mu ON e.i = mu.i JOIN v8 vv ON e.i = vv.i
         |GROUP BY vec_id""".stripMargin,

    "emb_abtt_isotropy" ->
      s"""WITH ${pcaCtes(8)},
         |nv AS MATERIALIZED (SELECT CAST(SUM(v * v) AS DOUBLE) AS vv FROM v8),
         |pj AS MATERIALIZED (SELECT vec_id, CAST(SUM((e.x - mu.m) * v8.v) AS BIGINT) AS p
         |  FROM e JOIN mu ON e.i = mu.i JOIN v8 ON e.i = v8.i GROUP BY vec_id),
         |rm AS MATERIALIZED (SELECT pj.vec_id, CAST(SUM(
         |    CAST(round(CAST(p AS DOUBLE) / (SELECT vv FROM nv) * v8.v) AS BIGINT)
         |      * v8.v) AS BIGINT) AS rmv
         |  FROM pj CROSS JOIN v8 GROUP BY pj.vec_id, pj.p),
         |pp AS (SELECT pj.vec_id, p, p - rmv AS pa FROM pj JOIN rm ON pj.vec_id = rm.vec_id),
         |ag AS (SELECT COUNT(*) AS n,
         |    CAST(SUM(CAST(p AS HUGEINT)) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(p AS HUGEINT) * p) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST(pa AS HUGEINT)) AS DOUBLE) AS a1,
         |    CAST(SUM(CAST(pa AS HUGEINT) * pa) AS DOUBLE) AS a2
         |  FROM pp)
         |SELECT n,
         |  ROUND((s2 / n - (s1 / n) * (s1 / n)) + 1e-9, 4) AS axis_var_before,
         |  ROUND((a2 / n - (a1 / n) * (a1 / n)) + 1e-9, 4) AS axis_var_after,
         |  CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0 THEN
         |    ROUND((a2 / n - (a1 / n) * (a1 / n))
         |      / (s2 / n - (s1 / n) * (s1 / n)) + 1e-9, 8) END AS residual_ratio
         |FROM ag""".stripMargin,

    "emb_abtt" ->
      s"""WITH ${pcaCtes(8)},
         |nv AS MATERIALIZED (SELECT CAST(SUM(v * v) AS DOUBLE) AS vv FROM v8),
         |pj AS MATERIALIZED (SELECT vec_id, CAST(SUM((e.x - mu.m) * v8.v) AS BIGINT) AS p
         |  FROM e JOIN mu ON e.i = mu.i JOIN v8 ON e.i = v8.i GROUP BY vec_id)
         |SELECT e.vec_id, e.i, CAST((e.x - mu.m)
         |  - round(CAST(p AS DOUBLE) / (SELECT vv FROM nv) * v8.v) AS BIGINT) AS resid
         |FROM e JOIN mu ON e.i = mu.i JOIN v8 ON e.i = v8.i
         |     JOIN pj ON e.vec_id = pj.vec_id""".stripMargin,

    "ann_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |sc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |       FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM r WHERE rk <= 5""".stripMargin,

    "emb_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id, label, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, label AS q_label, qv AS qq
         |       FROM q WHERE vec_id < 10),
         |sc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |       FROM qs CROSS JOIN q
         |       WHERE vec_id <> q_id AND label <> q_label),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |      FROM sc WHERE c < 0.95)
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM r WHERE rk <= 5""".stripMargin,

    // exact-integer centroid arithmetic: n^2*||x - S/n||^2 =
    // n^2*||x||^2 - 2n(x.S) + ||S||^2, all BIGINT (bounds: |q_i|<=3e3,
    // dim 64, n<=5e4 keeps every term < 2^62); decimal-cast sums make
    // the per-label mean/std order-independent
    "emb_label_outliers" ->
      s"""WITH q AS (SELECT vec_id, label, $qvSql AS qv FROM embeddings),
         |ex0 AS (SELECT vec_id, label, qv,
         |          UNNEST(range(1, len(qv) + 1)) AS i FROM q),
         |ex AS (SELECT vec_id, label, i, qv[i] AS x FROM ex0),
         |sums AS (SELECT label, i, SUM(x) AS s FROM ex GROUP BY label, i),
         |s2 AS (SELECT label, SUM(s * s) AS s2 FROM sums GROUP BY label),
         |np AS (SELECT label, COUNT(*) AS n FROM q GROUP BY label),
         |mom AS (SELECT e.vec_id, e.label,
         |          SUM(e.x * e.x) AS xx, SUM(e.x * m.s) AS xs
         |        FROM ex e JOIN sums m ON e.label = m.label AND e.i = m.i
         |        GROUP BY e.vec_id, e.label),
         |dd AS (SELECT mom.vec_id, mom.label,
         |         sqrt(CAST(n * n * xx - 2 * n * xs + s2 AS DOUBLE)) / n AS dist
         |       FROM mom JOIN np USING (label) JOIN s2 USING (label)),
         |st AS (SELECT label,
         |         ${Sql.decAvgSql("dist")} AS mu,
         |         ${Sql.decAvgSql("dist * dist")} AS m2
         |       FROM dd GROUP BY label),
         |zz AS (SELECT dd.label, vec_id, dist,
         |         (dist - mu) / sqrt(m2 - mu * mu) AS z
         |       FROM dd JOIN st USING (label)),
         |r AS (SELECT label, vec_id, dist, z, row_number() OVER (
         |        PARTITION BY label ORDER BY z DESC, vec_id) AS rk FROM zz)
         |SELECT label, vec_id, ROUND(dist + 1e-9, 4) AS dist,
         |  ROUND(z + 1e-9, 4) AS z, rk
         |FROM r WHERE rk <= 2""".stripMargin,

    // Cells = first `bits` hyperplane-sign bits, bits = smallest b with
    // 2^b * 50 >= corpus size (integer search, same as VectorOps.cellBits)
    "ann_ivf_topk" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |sc AS (SELECT a.vec_id AS q_id, a.cell AS cell, b.vec_id AS vec_id,
         |         ${cosSql("a.qv", "b.qv")} AS c
         |       FROM cl a JOIN cl b ON a.cell = b.cell
         |         AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM sc)
         |SELECT q_id, cell, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM r WHERE rk <= 3""".stripMargin,

    "ann_lsh_pairs" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |vb0 AS (
         |  SELECT vec_id, unnest(list_transform(range(0, 8), b ->
         |    md5(CAST(b AS VARCHAR) || '|' ||
         |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
         |  FROM sg),
         |vbh AS (SELECT bkey FROM vb0 GROUP BY bkey
         |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
         |bands AS (SELECT * FROM vb0 WHERE bkey NOT IN (SELECT bkey FROM vbh)),
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bands a JOIN bands b
         |    ON a.bkey = b.bkey AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT vec_a, vec_b, ${cosSql("qa.qv", "qb.qv")} AS c
         |  FROM cands
         |  JOIN q qa ON qa.vec_id = vec_a
         |  JOIN q qb ON qb.vec_id = vec_b)
         |SELECT vec_a, vec_b, ROUND(c + 1e-9, 6) AS cosine
         |FROM scored WHERE c >= 0.4""".stripMargin,

    "ann_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |        FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |isc AS (SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
         |         ${cosSql("a.qv", "b.qv")} AS c
         |       FROM cl a JOIN cl b ON a.cell = b.cell
         |         AND a.vec_id <> b.vec_id),
         |ir AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM isc),
         |approx AS (SELECT q_id, vec_id FROM ir WHERE rk <= 3 AND q_id < 10),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    // own cell (p = -1) plus each bit-p-flipped cell, joined against the
    // single-cell assignment — hamming-1 multi-probe
    "ann_ivf_multiprobe" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |pr AS (SELECT vec_id AS q_id, qv AS qqv,
         |         unnest(list_transform(range(-1, bits), p ->
         |           array_to_string(list_transform(range(1, bits + 1),
         |             h -> CASE WHEN h - 1 = p THEN 1 - sig[h] ELSE sig[h] END), ','))) AS cell
         |       FROM sg CROSS JOIN par),
         |msc AS (SELECT a.q_id, b.vec_id, ${cosSql("a.qqv", "b.qv")} AS c
         |        FROM pr a JOIN cl b ON a.cell = b.cell AND a.q_id <> b.vec_id),
         |mr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM msc)
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM mr WHERE rk <= 3""".stripMargin,

    "ann_multiprobe_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |        FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |pr AS (SELECT vec_id AS q_id, qv AS qqv,
         |         unnest(list_transform(range(-1, bits), p ->
         |           array_to_string(list_transform(range(1, bits + 1),
         |             h -> CASE WHEN h - 1 = p THEN 1 - sig[h] ELSE sig[h] END), ','))) AS cell
         |       FROM sg CROSS JOIN par),
         |msc AS (SELECT a.q_id, b.vec_id, ${cosSql("a.qqv", "b.qv")} AS c
         |        FROM pr a JOIN cl b ON a.cell = b.cell AND a.q_id <> b.vec_id),
         |mr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM msc),
         |approx AS (SELECT q_id, vec_id FROM mr WHERE rk <= 3 AND q_id < 10),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    // exact top-1 (er rk = 1) left-joined into the multiprobe full
    // ranking; rr = one IEEE division of the found rank
    "ann_multiprobe_mrr" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |        FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact1 AS (SELECT q_id, vec_id FROM er WHERE rk = 1),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |pr AS (SELECT vec_id AS q_id, qv AS qqv,
         |         unnest(list_transform(range(-1, bits), p ->
         |           array_to_string(list_transform(range(1, bits + 1),
         |             h -> CASE WHEN h - 1 = p THEN 1 - sig[h] ELSE sig[h] END), ','))) AS cell
         |       FROM sg CROSS JOIN par),
         |msc AS (SELECT a.q_id, b.vec_id, ${cosSql("a.qqv", "b.qv")} AS c
         |        FROM pr a JOIN cl b ON a.cell = b.cell AND a.q_id <> b.vec_id),
         |mr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM msc),
         |approx AS (SELECT q_id, vec_id, rk FROM mr
         |  WHERE rk <= 10 AND q_id < 10)
         |SELECT e.q_id, e.vec_id AS true_nn,
         |  CAST(COALESCE(a.rk, 0) AS BIGINT) AS rank_found,
         |  ROUND(CASE WHEN a.rk IS NOT NULL
         |    THEN CAST(1 AS DOUBLE) / a.rk ELSE CAST(0 AS DOUBLE) END
         |    + 1e-9, 6) AS rr
         |FROM exact1 e LEFT JOIN approx a USING (q_id, vec_id)""".stripMargin,

    "ann_ivf_kmeans" -> kmeansTopkSql,

    "ann_ivf_kmeans_hashfit" -> kmeansTopkSqlOn("TRUE", Some("kfit")),

    // SemDeDup: same Lloyd-fit replay, pairs restricted to shared
    // kcells cid, keep-min-id verdicts like dedup_embedding_cosine
    "semdedup" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes()},
         |pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosSql("a.qv", "b.qv")} AS c
         |  FROM kcells a JOIN kcells b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |flt AS (SELECT vec_a, vec_b, ROUND(c + 1e-9, 6) AS cosine
         |  FROM pr WHERE c >= 0.4)
         |SELECT vec_b AS vec_id, MIN(vec_a) AS dup_of,
         |  min_by(cosine, vec_a) AS cosine
         |FROM flt GROUP BY vec_b""".stripMargin,

    // the persisted-index serve path is pinned EQUAL to the direct
    // k-means search, so it shares the oracle verbatim
    "ann_index_roundtrip" -> kmeansTopkSql,

    // append path: Lloyd fit over the oldest 4/5 only; assignment and
    // serve over the full corpus at those centroids (deterministic
    // per-vector assignment ⇒ stored-cells ∪ appended-cells equals the
    // from-scratch full assignment this SQL computes)
    "ann_index_append" -> kmeansTopkSqlOn(
      "vec_id < (SELECT (MAX(vec_id) * 4) // 5 FROM embeddings)"),

    "ann_pq_topk" -> pqTopkSql,

    // IVF probe candidates (kcand, restricted to the query set) scored
    // through the PQ ADC tables — both CTE generators compose in one
    // WITH chain with disjoint names
    "ann_ivfpq_topk" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes()},
         |${pqCtes()},
         |cd AS (SELECT DISTINCT kcand.q_id, kcand.vec_id
         |  FROM kcand WHERE kcand.q_id < 10),
         |adi AS (SELECT cd.q_id, cd.vec_id, CAST(SUM(d) AS BIGINT) AS adist
         |  FROM cd
         |  JOIN codes ON codes.vec_id = cd.vec_id
         |  JOIN dt ON dt.q_id = cd.q_id AND dt.m = codes.m
         |    AND dt.code = codes.code
         |  GROUP BY cd.q_id, cd.vec_id)
         |SELECT q_id, vec_id, adist,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist, vec_id) AS INT) AS rk
         |FROM adi QUALIFY rk <= 3""".stripMargin,

    "ann_pq_recall" -> {
      def dist(a: String, b: String) =
        s"list_sum(list_transform(range(1, len($a) + 1), j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))"
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${dist("qq", "qv")} AS d
         |  FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY d, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |${pqCtes()},
         |ad AS (SELECT dt.q_id, codes.vec_id, CAST(SUM(d) AS BIGINT) AS adist
         |  FROM codes JOIN dt ON codes.m = dt.m AND codes.code = dt.code
         |  WHERE codes.vec_id <> dt.q_id
         |  GROUP BY dt.q_id, codes.vec_id),
         |approx AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist, vec_id) AS rk FROM ad) WHERE rk <= 3),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin
    },

    "decontam_semantic" ->
      s"""WITH q AS (SELECT vec_id, label = 0 AS is_eval, $qvSql AS qv
         |  FROM embeddings),
         |sg AS (SELECT vec_id, is_eval, qv, $sigSql AS sig FROM q),
         |vb0 AS (
         |  SELECT vec_id, is_eval, unnest(list_transform(range(0, 8), b ->
         |    md5(CAST(b AS VARCHAR) || '|' ||
         |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
         |  FROM sg),
         |vbh AS (SELECT bkey FROM vb0 GROUP BY bkey
         |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
         |bands AS (SELECT * FROM vb0 WHERE bkey NOT IN (SELECT bkey FROM vbh)),
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS train_id, b.vec_id AS eval_id
         |  FROM bands a JOIN bands b ON a.bkey = b.bkey
         |  WHERE NOT a.is_eval AND b.is_eval)
         |SELECT train_id, eval_id,
         |  ROUND(${cosSql("qa.qv", "qb.qv")} + 1e-9, 6) AS cosine
         |FROM cands
         |JOIN q qa ON qa.vec_id = train_id
         |JOIN q qb ON qb.vec_id = eval_id
         |WHERE ${cosSql("qa.qv", "qb.qv")} >= 0.4""".stripMargin,

    // the isolation-forest FIT + scoring replayed as one recursive CTE:
    // one iteration per depth level; subsample rows carry the fit
    // (FILTERed min/max/count per (tree, node) window), every row
    // carries its own traversal; node ids are path integers so depths
    // never collide
    "emb_iso_outliers" -> isoOracle,

    // SQ8 replay: per-dim [mn,mx] → byte code (nonnegative truncating
    // division) → decoded-midpoint integer numerators → the same
    // cross-join cosine ranking as the other recall oracles
    "ann_sq8_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |exd AS (SELECT vec_id, UNNEST(qv) AS x,
         |  UNNEST(range(1, len(qv) + 1)) AS i FROM q),
         |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM exd GROUP BY i),
         |cd AS (SELECT vec_id, i, CASE WHEN mx > mn
         |    THEN LEAST(
         |      510 * mn + (((x - mn) * 255) // (mx - mn) * 2 + 1) * (mx - mn),
         |      510 * mx)
         |    ELSE 510 * mn END AS xd
         |  FROM exd JOIN st USING (i)),
         |dv AS (SELECT vec_id, list(xd ORDER BY i) AS dq FROM cd GROUP BY vec_id),
         |dqs AS (SELECT vec_id AS q_id, dq AS qq FROM dv WHERE vec_id < 10),
         |asc_ AS (SELECT q_id, vec_id, ${cosSql("qq", "dq")} AS c
         |  FROM dqs CROSS JOIN dv WHERE vec_id <> q_id),
         |ar AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM asc_),
         |approx AS (SELECT q_id, vec_id FROM ar WHERE rk <= 3),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |  FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    // full-dim exact top-3 vs prefix-16 cosine top-3, per query
    "ann_matryoshka_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |  FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |tq AS (SELECT vec_id, qv[1:16] AS tv FROM q),
         |tqs AS (SELECT vec_id AS q_id, tv AS tt FROM tq WHERE vec_id < 10),
         |tsc AS (SELECT q_id, vec_id, ${cosSql("tt", "tv")} AS c
         |  FROM tqs CROSS JOIN tq WHERE vec_id <> q_id),
         |tr AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM tsc),
         |approx AS (SELECT q_id, vec_id FROM tr WHERE rk <= 3),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    // same sets/sig/bands replay as decontam_semantic over the sampled
    // sub-corpus; exact leg = all train×eval pairs at the threshold
    "decontam_semantic_recall" ->
      s"""WITH esamp AS (SELECT * FROM embeddings
         |  WHERE CAST('0x' || substr(md5('scr:' || CAST(vec_id AS VARCHAR)), 1, 15)
         |    AS BIGINT) % 1000000 < 500000),
         |q AS (SELECT vec_id, label = 0 AS is_eval, $qvSql AS qv FROM esamp),
         |sg AS (SELECT vec_id, is_eval, qv, $sigSql AS sig FROM q),
         |vb0 AS (
         |  SELECT vec_id, is_eval, unnest(list_transform(range(0, 8), b ->
         |    md5(CAST(b AS VARCHAR) || '|' ||
         |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
         |  FROM sg),
         |vbh AS (SELECT bkey FROM vb0 GROUP BY bkey
         |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
         |bands AS (SELECT * FROM vb0 WHERE bkey NOT IN (SELECT bkey FROM vbh)),
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS train_id, b.vec_id AS eval_id
         |  FROM bands a JOIN bands b ON a.bkey = b.bkey
         |  WHERE NOT a.is_eval AND b.is_eval),
         |lsh AS (SELECT train_id, eval_id FROM cands
         |  JOIN q qa ON qa.vec_id = train_id
         |  JOIN q qb ON qb.vec_id = eval_id
         |  WHERE ${cosSql("qa.qv", "qb.qv")} >= 0.4),
         |ex AS (SELECT a.vec_id AS train_id, b.vec_id AS eval_id
         |  FROM q a CROSS JOIN q b
         |  WHERE NOT a.is_eval AND b.is_eval
         |    AND ${cosSql("a.qv", "b.qv")} >= 0.4),
         |hits AS (SELECT e.train_id, e.eval_id,
         |    CASE WHEN l.train_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM ex e LEFT JOIN lsh l USING (train_id, eval_id))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS n_caught,
         |  CASE WHEN COUNT(*) = 0 THEN 1.0
         |       ELSE ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*) + 1e-9, 4) END
         |    AS recall
         |FROM hits""".stripMargin,

    "emb_int8_quant" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |m AS (SELECT vec_id, qv, list_min(qv) AS mn, list_max(qv) AS mx,
         |    list_max(qv) - list_min(qv) AS rng FROM q),
         |e AS (SELECT vec_id, mn, mx,
         |    list_transform(qv, x -> abs(mn * 255 +
         |      (CASE WHEN rng = 0 THEN 0
         |            ELSE ((x - mn) * 510 + rng) // (rng * 2) END) * rng
         |      - x * 255)) AS errs
         |  FROM m)
         |SELECT vec_id, mn, mx,
         |  list_max(errs) AS max_err_x255,
         |  CAST(list_sum(errs) AS BIGINT) AS sum_err_x255
         |FROM e""".stripMargin,

    "emb_rp16" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |hh AS (SELECT unnest(range(0, 16)) AS h)
         |SELECT q.vec_id, hh.h,
         |  CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] *
         |    ((CAST('0x' || substr(md5(CAST(h AS VARCHAR) || ',' ||
         |        CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) % 2) * 2 - 1)))
         |    AS BIGINT) AS p
         |FROM q CROSS JOIN hh""".stripMargin,

    "ann_rp_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs0 AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |        FROM qs0 CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |rp AS (SELECT vec_id, list_transform(range(0, 16), h ->
         |    CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] *
         |      ((CAST('0x' || substr(md5(CAST(h AS VARCHAR) || ',' ||
         |          CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) % 2) * 2 - 1)))
         |      AS BIGINT)) AS rp
         |  FROM q),
         |qs AS (SELECT vec_id AS q_id, rp AS qrp FROM rp WHERE vec_id < 10),
         |sc AS (SELECT q_id, rp.vec_id,
         |         list_sum(list_transform(range(1, 17),
         |           i -> (qrp[i] - rp.rp[i]) * (qrp[i] - rp.rp[i]))) AS dst
         |       FROM qs CROSS JOIN rp WHERE rp.vec_id <> q_id),
         |rr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY dst, vec_id) AS rk FROM sc),
         |approx AS (SELECT q_id, vec_id FROM rr WHERE rk <= 3),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    "emb_label_centroids" ->
      s"""WITH q AS (SELECT label, $qvSql AS qv FROM embeddings),
         |e AS (SELECT label, unnest(list_transform(range(1, len(qv) + 1),
         |        j -> {'i': j - 1, 'x': qv[j]})) AS u FROM q)
         |SELECT label, u.i AS i, COUNT(*) AS n_vecs,
         |  ROUND(CAST(SUM(u.x) AS DOUBLE) / COUNT(*) + 1e-9, 4) AS mean_c
         |FROM e GROUP BY label, u.i""".stripMargin,

    "ann_kmeans_recall" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, qv AS qq FROM q WHERE vec_id < 10),
         |esc AS (SELECT q_id, vec_id, ${cosSql("qq", "qv")} AS c
         |        FROM qs CROSS JOIN q WHERE vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |${kmeansCtes()},
         |ksc AS (SELECT q_id, vec_id, ${cosSql("qqv", "qv")} AS c FROM kcand),
         |kr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM ksc),
         |approx AS (SELECT q_id, vec_id FROM kr WHERE rk <= 3 AND q_id < 10),
         |hits AS (SELECT exact.q_id, COUNT(*) AS h
         |         FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id)
         |SELECT e.q_id, COALESCE(h, 0) AS hits,
         |  ROUND(COALESCE(h, 0) / 3.0e0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) e LEFT JOIN hits USING (q_id)""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |sg AS (SELECT vec_id, qv, $sigSql AS sig FROM q),
         |vb0 AS (
         |  SELECT vec_id, unnest(list_transform(range(0, 8), b ->
         |    md5(CAST(b AS VARCHAR) || '|' ||
         |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
         |  FROM sg),
         |vbh AS (SELECT bkey FROM vb0 GROUP BY bkey
         |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
         |bands AS (SELECT * FROM vb0 WHERE bkey NOT IN (SELECT bkey FROM vbh)),
         |cands AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bands a JOIN bands b
         |    ON a.bkey = b.bkey AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT vec_a, vec_b, ROUND(${cosSql("qa.qv", "qb.qv")} + 1e-9, 6) AS cosine
         |  FROM cands
         |  JOIN q qa ON qa.vec_id = vec_a
         |  JOIN q qb ON qb.vec_id = vec_b
         |  WHERE ${cosSql("qa.qv", "qb.qv")} >= 0.4)
         |SELECT vec_b AS vec_id, MIN(vec_a) AS dup_of,
         |  min_by(cosine, vec_a) AS cosine
         |FROM pairs GROUP BY vec_b""".stripMargin,

    // LSH-candidate cosine dedup (as dedup_embedding_cosine) -> survivor
    // set -> multi-probe top-3 with cell width from the survivor count
    "embedding_pipeline" ->
      s"""WITH q0 AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |sg0 AS (SELECT vec_id, qv, $sigSql AS sig FROM q0),
         |vbp0 AS (
         |  SELECT vec_id, unnest(list_transform(range(0, 8), b ->
         |    md5(CAST(b AS VARCHAR) || '|' ||
         |        array_to_string(list_slice(sig, b*8 + 1, b*8 + 8), ',')))) AS bkey
         |  FROM sg0),
         |vbph AS (SELECT bkey FROM vbp0 GROUP BY bkey
         |  HAVING COUNT(*) > ${graft.pipeline.DedupOps.MaxBandBucket}),
         |bands0 AS (SELECT * FROM vbp0 WHERE bkey NOT IN (SELECT bkey FROM vbph)),
         |cands0 AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bands0 a JOIN bands0 b
         |    ON a.bkey = b.bkey AND a.vec_id < b.vec_id),
         |dups AS (
         |  SELECT DISTINCT vec_b AS vec_id
         |  FROM cands0
         |  JOIN q0 qa ON qa.vec_id = vec_a
         |  JOIN q0 qb ON qb.vec_id = vec_b
         |  WHERE ${cosSql("qa.qv", "qb.qv")} >= 0.4),
         |sg AS (SELECT * FROM sg0
         |       WHERE vec_id NOT IN (SELECT vec_id FROM dups)),
         |par AS (SELECT COALESCE(MIN(bb.b), 16) AS bits
         |        FROM (SELECT UNNEST(range(1, 17)) AS b) bb
         |        CROSS JOIN (SELECT COUNT(*) AS n FROM sg) nn
         |        WHERE (1 << bb.b) * 50 >= nn.n OR bb.b = 16),
         |cl AS (SELECT vec_id, qv,
         |         array_to_string(list_slice(sig, 1, (SELECT bits FROM par)), ',') AS cell
         |       FROM sg),
         |pr AS (SELECT vec_id AS q_id, qv AS qqv,
         |         unnest(list_transform(range(-1, bits), p ->
         |           array_to_string(list_transform(range(1, bits + 1),
         |             h -> CASE WHEN h - 1 = p THEN 1 - sig[h] ELSE sig[h] END), ','))) AS cell
         |       FROM sg CROSS JOIN par),
         |msc AS (SELECT a.q_id, b.vec_id, ${cosSql("a.qqv", "b.qv")} AS c
         |        FROM pr a JOIN cl b ON a.cell = b.cell AND a.q_id <> b.vec_id),
         |mr AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM msc)
         |SELECT q_id, vec_id, ROUND(c + 1e-9, 6) AS cosine, rk
         |FROM mr WHERE rk <= 3""".stripMargin)

  /** DuckDB replay of [[graft.pipeline.VectorOps.isoOutliers]]: the
    * whole md5-deterministic isolation-forest fit AND every vector's
    * traversal in ONE recursive CTE — one iteration per depth level.
    * Every (tree, vector) pair is a state row; subsample membership
    * (`is_s`, the same adaptive draw the Spark side collects by) marks
    * the rows whose FILTERed per-(tree, node) window min/max/count
    * define the node's cut; node ids are path integers (root 1,
    * children 2n/2n+1), so a frozen leaf row (depth ld < it) can never
    * share a node id with an active row (ids at different depths live
    * in disjoint ranges). No cross-row sums exist — min/max are
    * order-free — so unlike the GBT replay no order-pinned fold is
    * needed anywhere. */
  private def isoOracle: String = {
    import graft.models.IsoLocal.{Trees, MaxDepth, Psi, DrawMod}
    val h60 = (e: String) => s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
    val fDraw = h60(s"'iso:' || CAST(t AS VARCHAR) || ':' || CAST(nd AS VARCHAR) || ':f'")
    val cDraw = h60(s"'iso:' || CAST(t AS VARCHAR) || ':' || CAST(nd AS VARCHAR) || ':c'")
    val sDraw = h60(s"'iso' || CAST(t.t AS VARCHAR) || ':' || CAST(q.vec_id AS VARCHAR)")
    s"""WITH RECURSIVE
       |q AS MATERIALIZED (SELECT vec_id, $qvSql AS qv FROM embeddings),
       |nc AS (SELECT COUNT(*) AS n FROM q),
       |thr AS (SELECT GREATEST(1, ($Psi * $DrawMod) // n) AS thr FROM nc),
       |st0 AS MATERIALIZED (
       |  SELECT t.t, q.vec_id,
       |    $sDraw % $DrawMod < (SELECT thr FROM thr) AS is_s,
       |    CAST(1 AS BIGINT) AS nd, CAST(NULL AS BIGINT) AS ld, q.qv
       |  FROM q CROSS JOIN (SELECT UNNEST(range(0, $Trees)) AS t) t),
       |rec AS (
       |  SELECT 0 AS it, * FROM st0
       |  UNION ALL
       |  SELECT it + 1, t, vec_id, is_s,
       |    CASE WHEN ld IS NOT NULL OR cutv IS NULL THEN nd
       |         ELSE 2*nd + CASE WHEN qv[f + 1] <= cutv THEN 0 ELSE 1 END END,
       |    CASE WHEN ld IS NOT NULL THEN ld
       |         WHEN cutv IS NULL THEN it ELSE NULL END,
       |    qv
       |  FROM (
       |    SELECT *, CASE WHEN sz >= 2 AND mn < mx
       |        THEN mn + ((mx - mn) * ($cDraw % $DrawMod)) // $DrawMod END AS cutv
       |    FROM (
       |      SELECT it, t, vec_id, is_s, nd, ld, qv, f,
       |        COUNT(*) FILTER (WHERE is_s AND ld IS NULL)
       |          OVER (PARTITION BY t, nd) AS sz,
       |        MIN(CASE WHEN is_s AND ld IS NULL THEN qv[f + 1] END)
       |          OVER (PARTITION BY t, nd) AS mn,
       |        MAX(CASE WHEN is_s AND ld IS NULL THEN qv[f + 1] END)
       |          OVER (PARTITION BY t, nd) AS mx
       |      FROM (SELECT *, ($fDraw % $DrawMod) % 64 AS f
       |            FROM rec WHERE it < $MaxDepth)))),
       |paths AS (SELECT vec_id, CAST(SUM(COALESCE(ld, $MaxDepth)) AS BIGINT) AS path_sum
       |  FROM rec WHERE it = $MaxDepth GROUP BY vec_id)
       |SELECT vec_id, path_sum,
       |  ROUND(CAST(path_sum AS DOUBLE) / $Trees + 1e-9, 4) AS mean_path
       |FROM paths ORDER BY path_sum, vec_id LIMIT 20""".stripMargin
  }

  /** Shared serve-router oracle chain — every mode leg (with rk), the
    * cell/dim evidence, the eligibility/pick logic — instantiated once
    * and consumed by TWO oracles: the ann_serve_mode diagnostic frame
    * and the ann_serve_pick_roundtrip picked-mode serve rows. One
    * spelling, so the router diagnostic and the persisted-pick serve
    * can never desync in the replay. */
  private lazy val serveModeOracle: (String, String) = {
      val slack = VectorOps.AnnServeRecallSlack
      val budgetCtes = VectorOps.AnnServeBudgets.zipWithIndex.map {
        case ((b, r), i) => graphBeamRoundCtes(s"g$i", b, r)
      }.mkString(",\n")
      val evidence =
        """  (SELECT ncells FROM cst) AS ncells,
          |  (SELECT max_cell FROM cst) AS max_cell,
          |  (SELECT n_vecs FROM cst) AS n_vecs""".stripMargin
      def recallOf(approx: String) =
        s"""ROUND(CAST((SELECT COUNT(*) FROM exact e JOIN $approx a
           |      USING (q_id, vec_id)) AS DOUBLE)
           |    / ((SELECT COUNT(DISTINCT q_id) FROM exact) * 3) + 1e-9, 4)
           |    AS mean_recall""".stripMargin
      def beamMode(i: Int, b: Int, r: Int) = {
        s"""SELECT 'beam_${b}x$r' AS mode, CAST($b AS BIGINT) AS beam,
           |  CAST($r AS BIGINT) AS rounds,
           |  ${recallOf(s"ba$i")},
           |  CAST((SELECT ncells FROM cst) + ${r * b * 3} AS BIGINT) AS visit_bound,
           |  CAST(((SELECT ncells FROM cst) + ${r * b * 3})
           |    * (SELECT dim FROM dm) * 8 AS BIGINT) AS bytes_bound,
           |$evidence""".stripMargin
      }
      // each budget's top-3 beam frame as a NAMED cte (q_id, vec_id, rk)
      // so the picked-serve oracle can read the winner's rows directly
      val beamTops = VectorOps.AnnServeBudgets.zipWithIndex.map {
        case ((b, r), i) =>
          s"""ba$i AS (SELECT q_id, vec_id, rk FROM (SELECT q_id, vec_id,
             |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
             |  FROM g${i}s$r WHERE vec_id <> q_id) WHERE rk <= 3)""".stripMargin
      }.mkString(",\n")
      val beamModes = VectorOps.AnnServeBudgets.zipWithIndex.map {
        case ((b, r), i) => beamMode(i, b, r) }.mkString("\nUNION ALL\n")
      val ctes = s"""WITH q AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |${kmeansCtes(4)},
         |$knnCtes,
         |ed AS (SELECT src, dst FROM knn),
         |$graphBeamHeadCtes,
         |$budgetCtes,
         |$beamTops,
         |${pqCtes()},
         |esc AS (SELECT q_id, q.vec_id AS vec_id, ${cosSql("qqv", "qv")} AS c
         |        FROM qry CROSS JOIN q WHERE q.vec_id <> q_id),
         |er AS (SELECT *, row_number() OVER (
         |         PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM esc),
         |exact AS MATERIALIZED (SELECT q_id, vec_id FROM er WHERE rk <= 3),
         |cst AS MATERIALIZED (SELECT COUNT(*) AS ncells, MAX(cn) AS max_cell,
         |    CAST(SUM(cn) AS BIGINT) AS n_vecs
         |  FROM (SELECT cid, COUNT(*) AS cn FROM kcells GROUP BY cid)),
         |dm AS (SELECT CAST(MAX(len(qv)) AS BIGINT) AS dim FROM q),
         |ivfa AS (SELECT q_id, vec_id, rk FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk
         |  FROM (SELECT q_id, vec_id, ${cosSql("qqv", "qv")} AS c
         |        FROM kcand WHERE q_id < 10)) WHERE rk <= 3),
         |pqad AS (SELECT k.q_id, k.vec_id, CAST(SUM(dt.d) AS BIGINT) AS adist
         |  FROM (SELECT q_id, vec_id FROM kcand WHERE q_id < 10) k
         |  JOIN codes ON codes.vec_id = k.vec_id
         |  JOIN dt ON dt.q_id = k.q_id AND dt.m = codes.m AND dt.code = codes.code
         |  GROUP BY k.q_id, k.vec_id),
         |pqa AS (SELECT q_id, vec_id, rk FROM (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rk
         |  FROM pqad) WHERE rk <= 3),
         |sqexd AS (SELECT vec_id, UNNEST(qv) AS x,
         |  UNNEST(range(1, len(qv) + 1)) AS i FROM q),
         |sqst AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM sqexd GROUP BY i),
         |sqcd AS (SELECT vec_id, i, CASE WHEN mx > mn
         |    THEN LEAST(
         |      510 * mn + (((x - mn) * 255) // (mx - mn) * 2 + 1) * (mx - mn),
         |      510 * mx)
         |    ELSE 510 * mn END AS xd
         |  FROM sqexd JOIN sqst USING (i)),
         |sqdv AS (SELECT vec_id, list(xd ORDER BY i) AS dq FROM sqcd GROUP BY vec_id),
         |sqqs AS (SELECT vec_id AS q_id, dq AS qq FROM sqdv WHERE vec_id < 10),
         |sqsc AS (SELECT q_id, vec_id, ${cosSql("qq", "dq")} AS c
         |  FROM sqqs CROSS JOIN sqdv WHERE vec_id <> q_id),
         |sqa AS (SELECT q_id, vec_id, rk FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM sqsc)
         |  WHERE rk <= 3),
         |mdim AS (SELECT CAST(LEAST(${VectorOps.AnnServeMatPrefixDim}, dim)
         |    AS BIGINT) AS md FROM dm),
         |mtq AS (SELECT vec_id, qv[1:(SELECT md FROM mdim)] AS tv FROM q),
         |mtqs AS (SELECT vec_id AS q_id, tv AS tt FROM mtq WHERE vec_id < 10),
         |mtsc AS (SELECT q_id, vec_id, ${cosSql("tt", "tv")} AS c
         |  FROM mtqs CROSS JOIN mtq WHERE vec_id <> q_id),
         |mta AS (SELECT q_id, vec_id, rk FROM (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY c DESC, vec_id) AS rk FROM mtsc)
         |  WHERE rk <= 3),
         |modes AS MATERIALIZED (
         |SELECT 'ivf_scan' AS mode, CAST(0 AS BIGINT) AS beam,
         |  CAST(0 AS BIGINT) AS rounds,
         |  ${recallOf("ivfa")},
         |  CAST((SELECT nprobe FROM np) * (SELECT max_cell FROM cst) AS BIGINT)
         |    AS visit_bound,
         |  CAST((SELECT nprobe FROM np) * (SELECT max_cell FROM cst)
         |    * (SELECT dim FROM dm) * 8 AS BIGINT) AS bytes_bound,
         |$evidence
         |UNION ALL
         |$beamModes
         |UNION ALL
         |SELECT 'ivf_pq' AS mode, CAST(0 AS BIGINT) AS beam,
         |  CAST(0 AS BIGINT) AS rounds,
         |  ${recallOf("pqa")},
         |  CAST((SELECT nprobe FROM np) * (SELECT max_cell FROM cst) AS BIGINT)
         |    AS visit_bound,
         |  CAST((SELECT nprobe FROM np) * (SELECT max_cell FROM cst) * 4
         |    AS BIGINT) AS bytes_bound,
         |$evidence
         |UNION ALL
         |SELECT 'sq8_scan' AS mode, CAST(0 AS BIGINT) AS beam,
         |  CAST(0 AS BIGINT) AS rounds,
         |  ${recallOf("sqa")},
         |  (SELECT n_vecs FROM cst) AS visit_bound,
         |  CAST((SELECT n_vecs FROM cst) * (SELECT dim FROM dm) AS BIGINT)
         |    AS bytes_bound,
         |$evidence
         |UNION ALL
         |SELECT 'mat' || CAST((SELECT md FROM mdim) AS VARCHAR) || '_scan'
         |    AS mode, CAST(0 AS BIGINT) AS beam,
         |  CAST(0 AS BIGINT) AS rounds,
         |  ${recallOf("mta")},
         |  (SELECT n_vecs FROM cst) AS visit_bound,
         |  CAST((SELECT n_vecs FROM cst) * (SELECT md FROM mdim) * 8
         |    AS BIGINT) AS bytes_bound,
         |$evidence),
         |best AS (SELECT MAX(mean_recall) AS br FROM modes),
         |elig AS (SELECT m.*, mean_recall >= br - $slack AS eligible
         |         FROM modes m CROSS JOIN best),
         |pick AS (SELECT mode AS pick_mode FROM elig WHERE eligible
         |         ORDER BY bytes_bound, mode LIMIT 1)""".stripMargin
      val diag = s"""$ctes
         |SELECT mode, beam, rounds, mean_recall, visit_bound, bytes_bound,
         |  ncells, max_cell, n_vecs,
         |  mode = (SELECT pick_mode FROM pick) AS picked
         |FROM elig""".stripMargin
      // the picked mode's serve rows: every leg gated on the pick, so
      // exactly ONE leg is non-empty — the schema stays fixed while the
      // winning mode stays corpus-dependent
      val beamLegs = VectorOps.AnnServeBudgets.zipWithIndex.map {
        case ((b, r), i) =>
          s"SELECT q_id, vec_id, rk FROM ba$i WHERE (SELECT pick_mode FROM pick) = 'beam_${b}x$r'"
      }
      val scanLegs = Seq(
        "SELECT q_id, vec_id, rk FROM ivfa WHERE (SELECT pick_mode FROM pick) = 'ivf_scan'",
        "SELECT q_id, vec_id, rk FROM pqa WHERE (SELECT pick_mode FROM pick) = 'ivf_pq'",
        "SELECT q_id, vec_id, rk FROM sqa WHERE (SELECT pick_mode FROM pick) = 'sq8_scan'",
        "SELECT q_id, vec_id, rk FROM mta WHERE (SELECT pick_mode FROM pick) = " +
          "'mat' || CAST((SELECT md FROM mdim) AS VARCHAR) || '_scan'")
      val served = s"""$ctes
         |${(scanLegs ++ beamLegs).mkString("\nUNION ALL\n")}""".stripMargin
      (diag, served)
    
  }

}
