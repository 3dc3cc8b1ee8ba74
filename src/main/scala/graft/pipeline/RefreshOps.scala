package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ARTIFACT COMPACTION — the write side of the incremental-refresh
  * loop. `incremental_refresh` emits one fate per non-unchanged
  * document (evicted / gated / near_dup / indexed(cid)); until now
  * nothing consumed them, so the persisted probe artifacts — the
  * MinHash band index `probeDupHits` screens against and the frozen-
  * centroid cell assignment `ivfKmeansAppend` serves from — drifted
  * one snapshot behind. These two folds apply a refresh run's fates to
  * those artifacts so the NEXT refresh probes the live corpus:
  *
  *  - every fated doc's STALE rows leave the artifact (an evicted,
  *    gated, changed, or near-dup doc must stop answering probes under
  *    its old content);
  *  - only `indexed` docs re-enter — with band keys derived from their
  *    NEW text, and the cell id the refresh already assigned against
  *    the frozen centroids (no refit, no re-probe: the fates ARE the
  *    decisions, compaction just writes them down).
  *
  * Cost shape: one anti-join on doc_id (a filter, never a pairing)
  * plus band derivation over the indexed delta ONLY — O(changed), the
  * same bound as the refresh itself; the unchanged corpus's artifact
  * rows are never touched or recomputed. RefreshCompactionSpec pins
  * the roundtrip: compact(artifacts(old), fates(old→new)) equals a
  * fresh artifact build over the live corpus, and a second refresh
  * probing the live corpus sees indexed docs and no evicted ghosts. */
object RefreshOps {

  /** Fold a refresh run's fates into the persisted MinHash band index:
    * drop every fated doc's rows, insert the `indexed` docs' bands
    * derived from `newDocs` (the NEW snapshot's text). Equals a fresh
    * `minhashBandsRelational` over the live indexed corpus because
    * band keys are a pure per-document function of text. */
  def compactBandIndex(bandIndex: DataFrame, fates: DataFrame,
                       newDocs: DataFrame): DataFrame = {
    val touched = fates.select(col("doc_id")).distinct()
    val indexed = fates.filter(col("action") === "indexed")
      .select(col("doc_id"))
    bandIndex.join(touched, Seq("doc_id"), "left_anti")
      .unionByName(DedupOps.minhashBandsRelational(
        newDocs.select(col("doc_id"), col("text"))
          .join(indexed, Seq("doc_id"))))
  }

  /** Fold a refresh run's fates into the persisted ExactSubstr gram
    * index ([[TextOps.substrGramIndex]] rows — (doc_id, gk), each live
    * document's distinct 60-bit gram keys): drop every fated doc's
    * rows, insert the `indexed` docs' gram keys derived from `newDocs`
    * (the NEW snapshot's text) — the exact [[compactBandIndex]] shape,
    * because both artifacts are per-document pure functions of text.
    * Carrying doc_id in the artifact is what makes eviction one
    * anti-join instead of per-gram refcount arithmetic: a gram shared
    * with a surviving document keeps that document's row and stays
    * probed; a gram whose LAST holder leaves has no rows left and
    * stops covering arriving text. Equals a fresh [[TextOps
    * .substrGramIndex]] over the live corpus (RefreshCompactionSpec
    * pins it); O(artifact + changed) like the band fold. */
  def compactGramIndex(gramIndex: DataFrame, fates: DataFrame,
                       newDocs: DataFrame, k: Int = 8): DataFrame = {
    val touched = fates.select(col("doc_id")).distinct()
    val indexed = fates.filter(col("action") === "indexed")
      .select(col("doc_id"))
    gramIndex.join(touched, Seq("doc_id"), "left_anti")
      .unionByName(TextOps.substrGramIndex(
        newDocs.select(col("doc_id"), col("text"))
          .join(indexed, Seq("doc_id")), k))
  }

  /** Fold the fates into the persisted cell assignment: drop every
    * fated doc's row, insert the `indexed` docs at the cell id the
    * refresh assigned against the FROZEN centroids (the
    * `ann_index_append` no-refit contract — compaction never moves an
    * unchanged doc's cell). An indexed fate with a NULL cid (a doc the
    * refresh admitted but that has no embedding row — the cid rides a
    * left join) carries no cell to enter: it is filtered, never planted
    * as a (vec_id, null) artifact row. */
  def compactCellAssignment(cells: DataFrame, fates: DataFrame): DataFrame =
    cells.join(fates.select(col("doc_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .unionByName(fates
        .filter(col("action") === "indexed" && col("cid").isNotNull)
        .select(col("doc_id").as("vec_id"), col("cid")))

  /** Fold the fates into the persisted GRAPH index — the artifact the
    * band/cell compactors above left growing without bound under churn
    * (an evicted doc's edge rows otherwise stay in `edges` forever,
    * wasting beam slots on every query and skewing the entry layer).
    *
    * Same-cell kNN edges mean a fated doc can only appear in edges whose
    * src lives in one of the doc's cells (old assignment for evictions,
    * the fate's frozen-centroid cid for insertions) — AND that every
    * OTHER node in such a cell may see its own top-k change when the
    * membership changes. So the fold is cell-scoped, not doc-scoped:
    *
    *  1. the live assignment = [[compactCellAssignment]](cells, fates);
    *  2. affected cells = every fated doc's old cell ∪ its new cell;
    *  3. edge rows whose src sits in an affected cell leave (this is
    *     both directions at once: a same-cell edge pointing AT a fated
    *     doc has its src in that doc's cell);
    *  4. the affected cells' live members get fresh `graphK` edges
    *     against the live membership — the SAME
    *     [[VectorOps.knnGraphFromCells]] spelling a full rebuild runs;
    *  5. the entry layer recomputes over the live assignment (one
    *     bounded draw per cell — [[VectorOps.entryLayer]]).
    *
    * Cost shape: O(Σ affected-cell size² + live corpus for the entry
    * draw) — the quadratic term covers CHANGED cells only, never a
    * corpus re-pair; unchanged cells' edge rows are untouched. Because
    * steps 3-4 rebuild affected cells from live state, re-running the
    * fold after a crash is idempotent. RefreshCompactionSpec pins
    * compact == a fresh [[VectorOps.knnGraphFromCells]] build over the
    * live corpus, serve-over-compacted returns no evicted doc at fresh
    * recall, and edge cardinality tracks the live corpus under churn.
    *
    * Returns (live cells, compacted edges, recomputed entries). */
  def compactGraphIndex(embLive: DataFrame, edges: DataFrame,
                        cells: DataFrame, fates: DataFrame,
                        graphK: Int = 3)
      : (DataFrame, DataFrame, DataFrame) = {
    val cellsNew = graft.CacheScope.persist(compactCellAssignment(cells, fates))
    val touched = fates.select(col("doc_id").as("vec_id")).distinct()
    val affected = graft.CacheScope.persist(
      cells.join(touched, Seq("vec_id")).select(col("cid"))
        .unionByName(cellsNew.join(touched, Seq("vec_id")).select(col("cid")))
        .distinct())
    val keep = edges
      .join(cells.select(col("vec_id").as("src"), col("cid")), Seq("src"))
      .join(affected, Seq("cid"), "left_anti")
      .select(col("src"), col("dst"))
    val rebuilt = VectorOps.knnGraphFromCells(embLive,
        cellsNew.join(affected, Seq("cid")).select(col("vec_id"), col("cid")),
        graphK, Some(cellsNew))
      .select(col("src"), col("dst"))
    (cellsNew, keep.unionByName(rebuilt), VectorOps.entryLayer(cellsNew))
  }

  /** [[compactGraphIndex]] against the PERSISTED artifact layout
    * ([[VectorOps.graphBeamAppend]] / the streamed-ingest dirs): fold
    * the fates into base cells ∪ every streamed batch dir and base
    * edges ∪ streamed edges ∪ their serve-time back-links, write the
    * compacted artifacts back as the new BASE, and drop the streamed
    * dirs — after this fold [[VectorOps.graphBeamServeStreamed]]'s
    * base-only fallback serves the compacted index directly. The
    * compacted frames are materialized (localCheckpoint) BEFORE the
    * base dirs are overwritten, so the fold never reads a path it is
    * writing; a crash mid-write is repaired by re-running the fold
    * (cell-scoped rebuilds are idempotent — see above). */
  def compactGraphIndexDirs(embLive: DataFrame, indexDir: String,
                            fates: DataFrame, graphK: Int = 3): Unit = {
    val spark = embLive.sparkSession
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
    val cells0 = spark.read.parquet(s"$indexDir/cells")
    val cells =
      if (exists(s"$indexDir/cells_stream"))
        cells0.unionByName(spark.read.parquet(s"$indexDir/cells_stream/*"))
      else cells0
    val edges0 = spark.read.parquet(s"$indexDir/edges")
    val edges =
      if (exists(s"$indexDir/edges_stream")) {
        val streamed = spark.read.parquet(s"$indexDir/edges_stream/*")
        edges0.unionByName(streamed)
          .unionByName(streamed.select(col("dst").as("src"), col("src").as("dst")))
      } else edges0
    val (cellsNew, edgesNew, entriesNew) =
      compactGraphIndex(embLive, edges, cells, fates, graphK)
    val cellsM = cellsNew.localCheckpoint()
    val edgesM = edgesNew.localCheckpoint()
    val entriesM = entriesNew.localCheckpoint()
    edgesM.write.mode("overwrite").parquet(s"$indexDir/edges")
    cellsM.write.mode("overwrite").parquet(s"$indexDir/cells")
    entriesM.write.mode("overwrite").parquet(s"$indexDir/entries")
    Seq("cells_stream", "edges_stream").foreach { d =>
      val hp = new org.apache.hadoop.fs.Path(s"$indexDir/$d")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) { fs.delete(hp, true); () }
    }
  }
}
