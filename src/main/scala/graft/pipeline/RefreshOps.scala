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

  /** Fold the fates into the persisted cell assignment: drop every
    * fated doc's row, insert the `indexed` docs at the cell id the
    * refresh assigned against the FROZEN centroids (the
    * `ann_index_append` no-refit contract — compaction never moves an
    * unchanged doc's cell). */
  def compactCellAssignment(cells: DataFrame, fates: DataFrame): DataFrame =
    cells.join(fates.select(col("doc_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .unionByName(fates.filter(col("action") === "indexed")
        .select(col("doc_id").as("vec_id"), col("cid")))
}
