package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** A12 — composite Simpson integration of a sampled series, as a typed
  * `Aggregator` UDAF (reference recoverytime/models.py:46-49 uses
  * scipy.integrate.simpson over a workload slice).
  *
  * Semantics on a UNIFORM grid of n samples with step h (ts sorted asc):
  *  - n odd:  h/3 · (y₀ + y_{n−1} + 4·Σ_{odd i} y_i + 2·Σ_{even interior})
  *  - n even: Simpson over the first n−1 points + trapezoid on the last
  *    interval (h·(y_{n−2}+y_{n−1})/2)
  *  - n == 1: 0; n == 2: single trapezoid.
  *
  * The buffer holds the group's observations (this operator integrates
  * BOUNDED slices — the reference integrates ≤ catch-up-window seconds at
  * 1 Hz, never an unbounded stream). The finish step sorts by ts and sums
  * weighted values with exact BigDecimal arithmetic, so results are
  * bit-identical to the relational weight-sum formulation in
  * [[graft.metrics.AggOps.simpsonSql]] and to a DuckDB oracle.
  */
object SimpsonUdaf extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], Double] {

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b1 ++= b2; b1
  }

  override def finish(buf: ArrayBuffer[(Long, Double)]): Double = {
    val obs = buf.sortBy(_._1)
    val n = obs.length
    if (n < 2) return 0.0
    val hL = obs(1)._1 - obs(0)._1
    // Simpson weights assume a uniform grid; a caller that forgot to
    // densify/interpolate first must fail loudly, not integrate wrongly
    // (AggOps.simpsonRaw takes h explicitly and has the same contract).
    var j = 1
    while (j < n - 1) {
      require(obs(j + 1)._1 - obs(j)._1 == hL,
        s"SimpsonUdaf requires a uniform grid: step ${obs(j + 1)._1 - obs(j)._1} at index $j != $hL")
      j += 1
    }
    val h = BigDecimal(hL)
    val y = obs.map(o => BigDecimal.valueOf(o._2))
    if (n == 2) return (y(0) + y(1)).toDouble * h.toDouble / 2
    val m = if (n % 2 == 1) n else n - 1 // odd-length Simpson prefix
    var s = BigDecimal(0)
    var i = 0
    while (i < m) {
      val w = if (i == 0 || i == m - 1) 1 else if (i % 2 == 1) 4 else 2
      s += y(i) * w
      i += 1
    }
    // h/3 may be non-terminating in decimal; multiply first, divide last,
    // then convert — matching the SQL form CAST(sum AS DOUBLE) * h / 3.
    val simpson = (s.toDouble) * h.toDouble / 3
    val trap = if (n % 2 == 0) (y(n - 2) + y(n - 1)).toDouble * h.toDouble / 2 else 0.0
    simpson + trap
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
