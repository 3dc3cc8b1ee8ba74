package graft

import graft.streaming.StreamingJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** A18/A19 as REAL Structured Streaming queries over a MemoryStream:
  * watermarked windowed aggregation, incremental batches, and agreement
  * with the batch form of the same plan. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  test("A18 top-speed windows run as a watermarked stream and match batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val streamed = StreamingJobs.topSpeedWindows(
      in.toDF.toDF("ts", "car_id", "speed"), windowLen = "60 seconds",
      watermark = "10 seconds")
    val q = streamed.writeStream.format("memory").queryName("topspeed")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        (ts(0), 1L, 10.0), (ts(30), 1L, 50.0), (ts(61), 1L, 20.0),
        (ts(10), 2L, 99.0), (ts(70), 2L, 42.0))
      in.addData(rows.take(3))
      q.processAllAvailable()
      in.addData(rows.drop(3))
      q.processAllAvailable()
      val got = spark.table("topspeed")
        .orderBy("car_id", "win_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val batch = StreamingJobs.topSpeedWindows(
        rows.toDF("ts", "car_id", "speed"), "60 seconds", "10 seconds")
        .orderBy("car_id", "win_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == batch)
      assert(got == Seq((1L, 0L, 50.0), (1L, 60L, 20.0), (2L, 0L, 99.0), (2L, 60L, 42.0)))
    } finally q.stop()
  }

  test("A19 campaign windows join a static dimension inside the stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val campaigns = Seq((1L, "alpha"), (2L, "beta")).toDF("c_custkey", "campaign")
    val streamed = StreamingJobs.campaignWindows(
      in.toDF.toDF("ts", "user_id", "event_type"), campaigns,
      windowLen = "60 seconds", watermark = "10 seconds")
    val q = streamed.writeStream.format("memory").queryName("campaigns")
      .outputMode("complete").start()
    try {
      in.addData(Seq(
        (ts(1), 1L, "view"), (ts(2), 1L, "view"), (ts(3), 1L, "click"),
        (ts(4), 2L, "view"), (ts(65), 1L, "view")))
      q.processAllAvailable()
      val got = spark.table("campaigns")
        .orderBy("campaign", "win_start").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("alpha", 0L, 2L), ("alpha", 60L, 1L), ("beta", 0L, 1L)))
    } finally q.stop()
  }

  test("S12 sine workload is deterministic and strictly positive") {
    val a = StreamingJobs.sineWorkload(spark, 200, 360, 100.0, 120.0, 0L, 1L)
      .collect().map(_.getDouble(1)).toSeq
    val b = StreamingJobs.sineWorkload(spark, 200, 360, 100.0, 120.0, 0L, 1L)
      .collect().map(_.getDouble(1)).toSeq
    assert(a == b)
    assert(a.forall(_ >= 0.0))
    assert(a.max > 200.0 && a.min < 100.0) // amplitude+phase shape present
  }

  test("optimize loop: foreachBatch accumulates history and emits decisions") {
    import graft.streaming.OptimizeLoop
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val store = "/root/repo/target/graft-tmp/optloop_store"
    new java.io.File(store).delete()
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(store), true)
    val decisions = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long, Boolean)]
    val q = OptimizeLoop.attach(
      in.toDF.toDF("sid", "ts", "value"), store, step = 1L,
      avgWindowPoints = 5, evalEveryBatches = 2, currentScaleOut = 8, candidateBest = 4,
      trigger = Trigger.ProcessingTime("0 seconds")) { (id, lat, thr, bck, best, resc) =>
        decisions += ((id, bck, best, resc))
      }.start()
    try {
      // rising latency + conslag, backpressure partially on
      val mk = (t: Long) => Seq(
        ("latency", t, 100.0 + 10 * t), ("throughput", t, 5000.0 - t),
        ("conslag", t, 50.0 + 5 * t), ("backpressure", t, if (t % 2 == 0) 1.0 else 0.0))
      in.addData((0L to 5L).flatMap(mk))
      q.processAllAvailable()
      in.addData((6L to 11L).flatMap(mk))
      q.processAllAvailable()
      assert(decisions.nonEmpty)
      val (_, bck, best, resc) = decisions.last
      assert(bck)              // slopes > 1 and partial backpressure => flagged
      assert(best == 4L)       // current invalid => candidate best wins
      assert(resc)             // 4 is not within {8,7,6}
    } finally q.stop()
  }
}
