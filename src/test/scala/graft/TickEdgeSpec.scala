package graft

import graft.streaming.OptimizeLoop

class TickEdgeSpec extends SparkSpec {
  import spark.implicits._

  // Degenerate metric histories an optimize tick can legitimately see
  // (empty first batch; a series missing entirely; one-point series whose
  // OLS design is singular). Under ANSI mode these used to raise
  // DIVIDE_BY_ZERO inside the slope closed form and kill the stream; the
  // contract is NULL slopes -> not-backpressured, and a decision is still
  // produced.
  test("evaluateTick survives empty, partial and one-point histories") {
    val empty = Seq.empty[(String, Long, Double)].toDF("sid", "ts", "value")
    val (latE, thrE, bckE, bestE, _) = OptimizeLoop.evaluateTick(empty, 1L, 5, 8, 4)
    assert(latE.isNaN && thrE.isNaN && !bckE && bestE == 4L)

    // latency+throughput only — conslag/backpressure series never arrived
    val partial = Seq(("latency", 0L, 100.0), ("latency", 1L, 110.0),
      ("throughput", 0L, 5000.0), ("throughput", 1L, 4990.0))
      .toDF("sid", "ts", "value")
    val (latP, thrP, bckP, _, _) = OptimizeLoop.evaluateTick(partial, 1L, 5, 8, 4)
    assert(latP == 105.0 && thrP == 4995.0 && !bckP)

    // one observation per series: singular OLS design in every slope
    val onept = Seq(("latency", 0L, 100.0), ("conslag", 0L, 5.0),
      ("backpressure", 0L, 0.0), ("throughput", 0L, 5000.0))
      .toDF("sid", "ts", "value")
    val (lat1, thr1, bck1, _, _) = OptimizeLoop.evaluateTick(onept, 1L, 5, 8, 4)
    assert(lat1 == 100.0 && thr1 == 5000.0 && !bck1)
  }
}
