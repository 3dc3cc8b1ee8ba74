package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{DedupOps, TextOps, VectorOps}

/** Throwaway SCALE.md probe: is incremental_refresh's per-delta work
  * actually O(changed)? Isolates the delta legs (gates, band probe,
  * centroid assignment) against PERSISTED corpus-side artifacts — the
  * production split the query's Scaladoc claims — and times them at
  * 10% vs 1% edit fractions, next to the one-time artifact build and
  * the full-reprocess comparator. */
object IncrSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time2(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $label: ${ts.min}%.2f s (min-of-2; reps ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val dd = Tables.documents(spark, d)
    dd.count() // warm parquet paths

    val emb = Tables.embeddings(spark, d)
    var cents: Array[Array[Long]] = null
    time2("artifact build: old-snapshot centroid fit") {
      cents = VectorOps.kmeansCentroids(
        emb.filter(TextOps.mdDraw6On("snapold", col("vec_id")) < 900000L),
        targetCellSize = 50)
    }

    // ---- delta legs only, against the persisted artifacts (the
    // unchanged index EXCLUDES the edited slice — a delta doc's own
    // pre-edit text in the base would self-match every probe and zero
    // out the assignment leg, measuring a different pipeline)
    for ((thr, lbl) <- Seq((100000L, "10pct"), (10000L, "1pct"))) {
      val unchanged = dd.filter(TextOps.mdDraw6("snapold") < 900000L &&
          TextOps.mdDraw6("snapnew") < 950000L &&
          TextOps.mdDraw6("snapedit") >= thr)
        .select(col("doc_id"), col("text"))
      val invBase = unchanged.transform(DedupOps.shingleRows(_)).persist()
      val bandsBase = DedupOps.capBands(
        DedupOps.minhashBandsFromInv(invBase), DedupOps.MaxBandBucket).persist()
      if (lbl == "10pct")
        time2("artifact build: unchanged-corpus shingle index + capped bands") {
          invBase.count(); bandsBase.count()
        }
      else { invBase.count(); bandsBase.count() }
      // changed-only delta (the fixture's 9.5% added slice would floor
      // the sweep at ~10% of the corpus otherwise)
      val delta = dd.filter(TextOps.mdDraw6("snapnew") < 950000L &&
          TextOps.mdDraw6("snapold") < 900000L &&
          TextOps.mdDraw6("snapedit") < thr)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .select(col("doc_id"), col("text")).persist()
      val n = delta.count()
      time2(s"delta legs @$lbl (n=$n): gates + band probe + assignment") {
        val pol = TextOps.policyGate(delta).select(col("doc_id"), col("keep").as("p_keep"))
        val gph = TextOps.gopherRules(
            delta.join(pol.filter(col("p_keep")).select("doc_id"), Seq("doc_id")))
          .select(col("doc_id"), col("keep").as("g_keep"))
        val sv = delta.join(pol, Seq("doc_id")).join(gph, Seq("doc_id"))
          .filter(col("p_keep") && col("g_keep")).select(col("doc_id"), col("text"))
        val invNew = DedupOps.shingleRows(sv)
        val bandsNew = DedupOps.minhashBandsFromInv(invNew)
        val cands = bandsNew.select(col("doc_id").as("new_id"), col("bkey"))
          .join(bandsBase.select(col("doc_id").as("old_id"), col("bkey")), Seq("bkey"))
          .select(col("new_id"), col("old_id")).distinct()
        val sizesB = invBase.groupBy(col("doc_id")).agg(count(lit(1)).as("nb"))
        val sizesN = invNew.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
        val dups = cands
          .join(invNew.select(col("doc_id").as("new_id"), col("s")), Seq("new_id"))
          .join(invBase.select(col("doc_id").as("old_id"), col("s")), Seq("old_id", "s"))
          .groupBy(col("new_id"), col("old_id")).agg(count(lit(1)).as("inter"))
          .join(sizesN.select(col("doc_id").as("new_id"), col("na")), Seq("new_id"))
          .join(sizesB.select(col("doc_id").as("old_id"), col("nb")), Seq("old_id"))
          .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= 0.5)
          .groupBy(col("new_id")).agg(count(lit(1)).as("hits"))
        val fresh = sv.select(col("doc_id"))
          .join(dups.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_anti")
        VectorOps.kmeansRanked(
            emb.join(fresh.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id")),
            cents, maxRank = 1)
          .write.format("noop").mode("overwrite").save()
      }
      delta.unpersist(); invBase.unpersist(); bandsBase.unpersist()
    }

    // ---- full-reprocess comparator: every per-doc stage over the WHOLE
    // new snapshot (gates + full self-pair dedup + full assignment)
    time2("full reprocess: gates + minhashPairs self-join + full assignment") {
      graft.CacheScope.scoped {
        val snap = dd.filter(TextOps.mdDraw6("snapnew") < 950000L)
        val pol = TextOps.policyGate(snap).select(col("doc_id"), col("keep").as("p_keep"))
        val gph = TextOps.gopherRules(
          snap.join(pol.filter(col("p_keep")).select("doc_id"), Seq("doc_id")))
        gph.write.format("noop").mode("overwrite").save()
        DedupOps.minhashPairs(snap).write.format("noop").mode("overwrite").save()
        VectorOps.kmeansRanked(emb, VectorOps.kmeansCentroids(emb, 50), maxRank = 1)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
