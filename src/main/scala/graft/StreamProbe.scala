package graft

import org.apache.spark.sql.SparkSession

/** State-store growth probe for the stateful streams (SCALE.md
  * evidence): drives `softWeightStream` and `patternMonitorStream`
  * through MemoryStream batches ~100× the spec fixtures and reports
  * the state-store row counts the progress API exposes, so the
  * "state tracks distinct corpus / series count, never stream length"
  * claims are measured numbers instead of design prose.
  *
  * Run: `sbt "runMain graft.StreamProbe [nFamilies] [nSeries] [nPoints]"`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nFamilies = args.headOption.map(_.toInt).getOrElse(500)
    val nSeries = args.lift(1).map(_.toInt).getOrElse(100)
    val nPoints = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sorted.toSeq

    // ---- softWeightStream: nFamilies distinct texts, each arriving as a
    // 4-member near-dup family (rep + 3 joiners), then the WHOLE corpus
    // replayed once — stream length 2x corpus, state must not move
    {
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingJobs.softWeightStream(
          in.toDF.toDF("doc_id", "text"))
        .writeStream.format("noop").outputMode("append").start()
      def fam(f: Int) =
        (0 until 4).map(m => ((f * 10 + m).toLong,
          (0 until 8).map(w => s"fam${f}w$w").mkString(" ")))
      val corpus = (0 until nFamilies).flatMap(fam)
      corpus.grouped(corpus.size / 4 + 1).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val afterCorpus = stateRows(q)
      in.addData(corpus); q.processAllAvailable() // full replay
      val afterReplay = stateRows(q)
      println(s"""{"probe":"softWeightStream","families":$nFamilies,"docs":${corpus.size},""" +
        s""""stream_rows":${corpus.size * 2},"state_after_corpus":${afterCorpus.mkString("[", ",", "]")},""" +
        s""""state_after_replay":${afterReplay.mkString("[", ",", "]")}}""")
      q.stop()
    }

    // ---- refreshStream: nFamilies docs upserted, then EVERY doc
    // re-upserted with CHANGED text (the ghost scenario at scale), then
    // half deleted — state must track the LIVE corpus at each step,
    // never the 2.5x stream length
    {
      val in = MemoryStream[(Long, Long, String, String, Seq[Float])]
      val cents = graft.pipeline.VectorOps.kmeansCentroids(
        Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
          .toDF("vec_id", "embedding"), targetCellSize = 1)
      val q = graft.streaming.StreamingJobs.refreshStream(in.toDS(), cents)
        .writeStream.format("noop").outputMode("append").start()
      val e1 = Seq(1f, 0f, 0f, 0f)
      // gate-passing geometry: 24 words, 2 stopwords, every content
      // word exactly 5 chars (mean length inside Gopher's [4,5])
      def b36(x: Long, w: Int) = {
        val s = java.lang.Long.toString(x, 36)
        ("0" * (w - s.length)) + s
      }
      def text(f: Long, v: Int) =
        ("the" +: "of" +: (0 until 22).map(i =>
          s"q${b36(f, 2)}$v${b36(i.toLong, 1)}")).mkString(" ")
      val n = nFamilies.toLong
      (0L until n).grouped(500).zipWithIndex.foreach { case (b, i) =>
        in.addData(b.map(d => (d, i.toLong * 10000 + d, "upsert", text(d, 1), e1)))
        q.processAllAvailable()
      }
      val afterV1 = stateRows(q)
      (0L until n).grouped(500).zipWithIndex.foreach { case (b, i) =>
        in.addData(b.map(d => (d, 100000L + i * 10000 + d, "upsert", text(d, 2), e1)))
        q.processAllAvailable()
      }
      val afterV2 = stateRows(q)
      (0L until n / 2).grouped(500).zipWithIndex.foreach { case (b, i) =>
        in.addData(b.map(d => (d, 200000L + i * 10000 + d, "delete", text(d, 2), e1)))
        q.processAllAvailable()
      }
      val afterDel = stateRows(q)
      println(s"""{"probe":"refreshStream","docs":$n,"stream_rows":${n * 5 / 2},""" +
        s""""state_after_v1":${afterV1.mkString("[", ",", "]")},""" +
        s""""state_after_v2_rewrite":${afterV2.mkString("[", ",", "]")},""" +
        s""""state_after_half_deleted":${afterDel.mkString("[", ",", "]")}}""")
      q.stop()
    }

    // ---- graphIngestStream: per-trigger wall time vs accumulated batch
    // dirs, folded (foldEvery=4) against never-folded — the unfolded
    // trigger re-reads every prior batch dir (input scan O(streamed)),
    // the fold bounds the per-trigger dir count at foldEvery. Work per
    // trigger (assignment + edge build) is identical in both runs, so
    // the time difference IS the artifact-scan growth.
    {
      import org.apache.spark.sql.functions.col
      def emb(i: Long): Seq[Float] =
        (0 until 16).map(d => (((i * 37 + d * 13) % 201) - 100) / 100f)
      val corpus = (0L until 2000L).map(i => (i, emb(i)))
        .toDF("vec_id", "embedding")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      def run(foldEvery: Int, tag: String): (Seq[Double], Int) = {
        val dir = s"/tmp/graft-probe/graph_ingest_$tag"
        rm(new java.io.File(dir))
        graft.pipeline.VectorOps.graphBeamAppend(corpus, splitId = 1000L,
          queryMaxId = 1, k = 3, indexDir = dir).collect()
        val in = MemoryStream[(Long, Seq[Float])]
        val q = graft.streaming.StreamingJobs.graphIngestStream(
            in.toDS().toDF("vec_id", "embedding"), corpus, dir,
            foldEvery = foldEvery)
          .option("checkpointLocation", s"$dir/ckpt").start()
        val times = (0 until 16).map { b =>
          val batch = (1000L + b * 50L until 1000L + (b + 1) * 50L)
            .map(i => (i, emb(i)))
          val t0 = System.nanoTime()
          in.addData(batch); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        q.stop()
        val nDirs = new java.io.File(s"$dir/cells_stream")
          .listFiles().count(_.isDirectory)
        (times, nDirs)
      }
      val (tNo, dNo) = run(foldEvery = 1000, tag = "nofold")
      val (tFold, dFold) = run(foldEvery = 4, tag = "fold")
      def r2(xs: Seq[Double]) = xs.map(t => math.round(t * 100) / 100.0)
      println(s"""{"probe":"graphIngestStream","triggers":16,"batch":50,""" +
        s""""nofold_trigger_sec":${r2(tNo).mkString("[", ",", "]")},"nofold_dirs":$dNo,""" +
        s""""fold_trigger_sec":${r2(tFold).mkString("[", ",", "]")},"fold_dirs":$dFold}""")
    }

    // ---- patternMonitorStream: nSeries series x nPoints points — state
    // rows must equal nSeries regardless of nPoints
    {
      val in = MemoryStream[(String, Long, Long)]
      val qv = Array.tabulate(24)(i => (i * 37 % 101).toLong)
      val q = graft.streaming.StreamingJobs.patternMonitorStream(
          in.toDS(), qv, win = 24, step = 3600L)
        .writeStream.format("noop").outputMode("append").start()
      val t0 = 1700000000L
      (0 until nPoints).grouped(nPoints / 8 + 1).foreach { chunk =>
        in.addData(for {
          p <- chunk
          s <- 0 until nSeries
        } yield (s"series_$s", t0 + p * 3600L, ((s * 7 + p * 13) % 997).toLong))
        q.processAllAvailable()
      }
      val rows = stateRows(q)
      println(s"""{"probe":"patternMonitorStream","series":$nSeries,"points_per_series":$nPoints,""" +
        s""""stream_rows":${nSeries * nPoints},"state_rows":${rows.mkString("[", ",", "]")}}""")
      q.stop()
    }
    spark.stop()
  }
}
