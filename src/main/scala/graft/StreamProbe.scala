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
