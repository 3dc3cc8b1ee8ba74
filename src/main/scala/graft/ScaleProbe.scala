package graft

import graft.pipeline.TextOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale measurements the bench can't express (SCALE.md's
  * empirical loop): per-query SHUFFLE-BYTES (a task-end listener
  * summing shuffle write metrics — the currency the 60-bit gram keys
  * exist to cut) and the gram-index PROBE cost against a persisted
  * artifact vs the re-derive spelling, at whatever corpus
  * `SPARK_GRAFT_SF_DIR` points to. Prints one JSON line per probe.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })
    // noop sink: materializes EVERY column (an aggregate probe lets
    // Catalyst prune the very work being measured); min-of-2 with the
    // first full run as codegen/JIT warmup, shuffle bytes from run 2
    def measure(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        CacheScope.scoped {
          f.write.mode("overwrite").format("noop").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      // the listener bus is async — give task-end events a beat to land
      Thread.sleep(1000)
      println(f"""{"probe":"$label","sec":${secs.min}%.3f,"shuffle_mb":${shuffleBytes.get / 1e6}%.1f}""")
    }
    val docs = Tables.documents(spark, sfDir)
    // JVM/codegen warmup outside any measurement
    docs.agg(count(lit(1))).collect()
    // 1. the shuffle-byte cut: hashed 60-bit gram keys vs the k-token
    //    string spelling, same semantics (pinned by spec)
    measure("exact_substr_hashed") {
      TextOps.exactSubstringDedup(docs, 8, hashed = true)
    }
    measure("exact_substr_string") {
      TextOps.exactSubstringDedup(docs, 8, hashed = false)
    }
    measure("gopher_repetition_hashed") {
      TextOps.gopherRepetition(docs, hashed = true)
    }
    measure("gopher_repetition_string") {
      TextOps.gopherRepetition(docs, hashed = false)
    }
    // 2. the probe-cost split: a FIXED 500-doc batch (sf0.001 docs under
    //    a disjoint id space) probed against this corpus's gram index —
    //    once re-deriving the index (the pure-function query spelling),
    //    once against the persisted artifact (the production spelling;
    //    build billed separately). The artifact probe's residual cost is
    //    a columnar scan of the 8-byte key column — no corpus tokenize/
    //    explode/distinct per batch.
    val batch = Tables.documents(spark, "/root/testdata/sf0.001")
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val idxDir = s"/tmp/graft-scaleprobe-idx-${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    TextOps.substrGramIndex(docs).write.mode("overwrite")
      .parquet(s"$idxDir/grams")
    measure("probe_rederive") {
      TextOps.exactSubstrProbe(docs, batch)
    }
    measure("probe_artifact") {
      TextOps.exactSubstrProbeWith(spark.read.parquet(s"$idxDir/grams"), batch)
    }
    // 3. the serve-router pick, persisted vs cached: the persist path
    //    pays the full diagnostic (7 measured serves incl. the brute
    //    exact baseline); the cached path reads the pick and pays the
    //    picked search alone — the steady-state serve cost a deploy
    //    actually sees per query batch
    val emb = Tables.embeddings(spark, sfDir)
    val pickDir = s"$idxDir/servepick"
    measure("ann_serve_persist") {
      graft.pipeline.VectorOps.annServePersist(emb, queryMaxId = 10, k = 3,
        indexDir = pickDir)
    }
    measure("ann_serve_cached") {
      graft.pipeline.VectorOps.annServeCached(emb, queryMaxId = 10, k = 3,
        indexDir = pickDir)
    }
    spark.stop()
  }
}
