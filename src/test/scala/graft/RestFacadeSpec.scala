package graft

import graft.api.RestFacade

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** §3.4 REST façade end-to-end over a real HTTP socket: the engine's own
  * JSON codec parses the bodies, the engine operators answer. */
class RestFacadeSpec extends SparkSpec {

  private lazy val client = HttpClient.newHttpClient()

  private def post(url: String, body: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def get(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def ts(n: Int, f: Int => Double): String = {
    val obs = (0 until n)
      .map(i => s"""{"timestamp": ${1704067200 + i * 60}, "value": ${f(i)}}""")
    s"""{"observations": [${obs.mkString(", ")}]}"""
  }

  test("facade routes answer with engine results over real HTTP") {
    val f = RestFacade.start(spark, models = 4)
    try {
      // workload/prediction: forecast of a wiggly series, horizon 2 steps
      val (c1, b1) = post(f.url("/workload/prediction"),
        s"""{"job": "TEST", "workload": ${ts(60, i => 100.0 + i + (i % 5))},
           | "prediction_period_in_s": 120}""".stripMargin)
      assert(c1 == 200 && b1.contains("\"observations\""), b1)
      // two forecast points, timestamps continue the 60s grid
      assert(b1.contains("\"count\": 2"))
      assert(b1.contains((1704067200L + 60 * 60 + 60).toString))
      // horizon above models*step is refused (the reference's 412)
      val (c2, _) = post(f.url("/workload/prediction"),
        s"""{"job": "TEST", "workload": ${ts(60, _.toDouble)},
           | "prediction_period_in_s": 100000}""".stripMargin)
      assert(c2 == 412)

      // common/regression: named series -> M7 slope/intercept
      val (c3, b3) = post(f.url("/common/regression"),
        s"""{"lin": ${ts(10, i => 5.0 + 2.0 * i)}}""")
      assert(c3 == 200, b3)
      // slope 2 per 60s step = 1/30 per ts unit
      assert(b3.contains("\"lin\""))
      val slope = "\"slope\": ([-0-9.eE]+)".r.findFirstMatchIn(b3).get.group(1).toDouble
      assert(math.abs(slope - 2.0 / 60.0) < 1e-6, b3) // slope rounds to 6 dp

      // twres: prediction before training is refused; training then enables it
      val predBody =
        s"""{"job": "T2", "avg_latency": 100.0, "max_latency_constraint": 2000.0,
           | "scale_out": 8, "time_window_interval": 300,
           | "workload": ${ts(60, i => 200.0 + (i % 7))},
           | "min_scale_out": 2, "max_scale_out": 12}""".stripMargin
      assert(post(f.url("/baselines/twres_prediction"), predBody)._1 == 412)
      val (c4, b4) = post(f.url("/baselines/twres_training"),
        """{"job": "T2", "scale_outs": [2, 4, 8, 12],
          | "throughput_rates": [120.0, 260.0, 500.0, 750.0]}""".stripMargin)
      assert(c4 == 200 && b4.contains("task_hash"), b4)
      // the synchronous task is no longer running
      val hash = "\"task_hash\": \"([0-9a-f]+)\"".r.findFirstMatchIn(b4).get.group(1)
      assert(get(f.url(s"/common/tasks/$hash")) == ((200, "false")))
      val (c5, b5) = post(f.url("/baselines/twres_prediction"), predBody)
      assert(c5 == 200, b5)
      val so = "\"scale_out\": ([0-9]+)".r.findFirstMatchIn(b5).get.group(1).toInt
      assert(so >= 2 && so <= 12, b5)
    } finally f.stop()
  }

  test("latency routes: 412 before fit, clustered classes + GBT latencies after") {
    val f = RestFacade.start(spark, models = 4)
    try {
      val predBody =
        """{"job": "L", "min_scale_out": 2, "max_scale_out": 6,
          | "scale_out": 4, "throughput_rate": 300.0}""".stripMargin
      assert(post(f.url("/latency/prediction"), predBody)._1 == 412)
      // two clear latency regimes: low (~10) at high scale-out, high
      // (~900) at low scale-out
      val (ct, bt) = post(f.url("/latency/training"),
        """{"job": "L",
          | "scale_outs": [2, 2, 3, 3, 5, 5, 6, 6],
          | "throughput_rates": [300, 320, 300, 320, 300, 320, 300, 320],
          | "latencies": [900.0, 880.0, 910.0, 905.0, 11.0, 10.0, 9.5, 10.5]}""".stripMargin)
      assert(ct == 200 && bt.contains("task_hash"), bt)
      val hash = "\"task_hash\": \"([0-9a-f]+)\"".r.findFirstMatchIn(bt).get.group(1)
      assert(get(f.url(s"/common/tasks/$hash")) == ((200, "false")))
      val (cp, bp) = post(f.url("/latency/prediction"), predBody)
      assert(cp == 200, bp)
      // high scale-outs predict low latency -> valid (low cluster); low
      // scale-outs predict high latency -> invalid; best = first valid
      val lats = "\\{\"scale_out\": ([0-9]+), \"latency\": ([-0-9.eE]+), \"is_best\": (\\w+), \"is_valid\": (\\w+)\\}".r
        .findAllMatchIn(bp).map(m =>
          (m.group(1).toInt, m.group(2).toDouble, m.group(3).toBoolean, m.group(4).toBoolean)).toSeq
      val cands = lats.drop(1) // first match is "current"
      assert(cands.map(_._1) == Seq(2, 3, 4, 5, 6), bp)
      assert(!cands.find(_._1 == 2).get._4 && cands.find(_._1 == 6).get._4, bp)
      assert(cands.count(_._3) == 1 && cands.find(_._3).get._4, bp)
      assert(cands.find(_._1 == 2).get._2 > 500 && cands.find(_._1 == 6).get._2 < 100, bp)
      // evaluation over an explicit candidate set: only is_valid=true
      // candidates can stay valid
      val (ce, be) = post(f.url("/latency/evaluation"),
        """{"job": "L",
          | "current": {"scale_out": 5, "is_best": false, "is_valid": true},
          | "candidates": [
          |   {"scale_out": 2, "is_best": false, "is_valid": true},
          |   {"scale_out": 5, "is_best": false, "is_valid": true},
          |   {"scale_out": 6, "is_best": false, "is_valid": false}],
          | "predicted_throughput_rate": 310.0}""".stripMargin)
      assert(ce == 200, be)
      val ev = "\\{\"scale_out\": ([0-9]+), \"latency\": [-0-9.eE]+, \"is_best\": \\w+, \"is_valid\": (\\w+)\\}".r
        .findAllMatchIn(be).map(m => (m.group(1).toInt, m.group(2).toBoolean)).toSeq.drop(1)
      assert(ev.map(_._1) == Seq(2, 5, 6), be)
      // 6 was previously invalid -> stays invalid even though its
      // predicted latency is in the low cluster
      assert(!ev.find(_._1 == 6).get._2 && ev.find(_._1 == 5).get._2, be)
      // duplicate scale-out: the FIRST occurrence owns is_valid — a later
      // valid duplicate must not resurrect it
      val (cd, bd) = post(f.url("/latency/evaluation"),
        """{"job": "L",
          | "current": {"scale_out": 5, "is_best": false, "is_valid": true},
          | "candidates": [
          |   {"scale_out": 5, "is_best": false, "is_valid": false},
          |   {"scale_out": 5, "is_best": false, "is_valid": true}],
          | "predicted_throughput_rate": 310.0}""".stripMargin)
      assert(cd == 200, bd)
      assert(!bd.contains("\"is_valid\": true"), bd)
      // cache hygiene: every route handler runs inside CacheScope.scoped
      // (RestFacade.route), and CacheScopeSpec proves scoped releases all
      // registered persists — a global registry assertion here would race
      // with suites sharing this SparkSession in the parallel test JVM
    } finally f.stop()
  }

  test("recoverytime routes: 412 before fit, catch-up + forecast stats after") {
    val f = RestFacade.start(spark, models = 4)
    try {
      val predBody =
        s"""{"job": "R", "min_scale_out": 2, "max_scale_out": 6, "scale_out": 4,
           | "workload": ${ts(60, i => 100.0 + (i % 5))},
           | "prediction_period_in_s": 120, "downtime": 10.0,
           | "last_checkpoint": 90.0, "max_recovery_time": 600.0}""".stripMargin
      assert(post(f.url("/recoverytime/prediction"), predBody)._1 == 412)
      val (ct, bt) = post(f.url("/recoverytime/training"),
        """{"job": "R", "scale_outs": [2, 4, 8],
          | "max_throughput_rates": [124.2, 248.4, 496.8]}""".stripMargin)
      assert(ct == 200 && bt.contains("task_hash"), bt)
      val (cp, bp) = post(f.url("/recoverytime/prediction"), predBody)
      assert(cp == 200, bp)
      assert(bp.contains("\"predicted_throughput_rate\": ") && bp.contains("\"slope\": "), bp)
      val rts = "\\{\"scale_out\": ([0-9]+), \"recovery_time\": ([-0-9.eE]+)".r
        .findAllMatchIn(bp).map(m => (m.group(1).toInt, m.group(2).toDouble)).toSeq.drop(1)
      assert(rts.map(_._1) == Seq(2, 3, 4, 5, 6), bp)
      // every recovery time includes the 10 s downtime, and higher
      // scale-outs (more capacity) never recover slower
      assert(rts.forall(_._2 >= 10.0), bp)
      assert(rts.sliding(2).forall(p => p.head._2 >= p.last._2 - 1e-9), bp)
      // forecast peak of a ~100-104 workload lands in that band
      val ptr = "\"predicted_throughput_rate\": ([-0-9.eE]+)".r
        .findFirstMatchIn(bp).get.group(1).toDouble
      assert(ptr > 90 && ptr < 115, bp)
      // horizon above models*step refused
      val (ch, _) = post(f.url("/recoverytime/prediction"),
        predBody.replace("\"prediction_period_in_s\": 120", "\"prediction_period_in_s\": 100000"))
      assert(ch == 412)
      // evaluation path: explicit candidates, current among them
      val (ce, be) = post(f.url("/recoverytime/evaluation"),
        s"""{"job": "R",
           | "current": {"scale_out": 4, "is_best": false, "is_valid": true},
           | "candidates": [
           |   {"scale_out": 2, "is_best": false, "is_valid": true},
           |   {"scale_out": 4, "is_best": false, "is_valid": true}],
           | "workload": ${ts(60, i => 100.0 + (i % 5))},
           | "prediction_period_in_s": 120, "downtime": 10.0,
           | "last_checkpoint": 90.0, "max_recovery_time": 600.0}""".stripMargin)
      assert(ce == 200, be)
      val ev = "\\{\"scale_out\": ([0-9]+), \"recovery_time\":".r
        .findAllMatchIn(be).map(_.group(1).toInt).toSeq.drop(1)
      assert(ev == Seq(2, 4), be)
      // horizon 1 (period == one step): a single-point forecast has no
      // fittable slope — the route reports slope 0 instead of a 500
      val (c1, b1) = post(f.url("/recoverytime/prediction"),
        predBody.replace("\"prediction_period_in_s\": 120", "\"prediction_period_in_s\": 60"))
      assert(c1 == 200, b1)
      assert("\"slope\": ([-0-9.eE]+)".r.findFirstMatchIn(b1).get.group(1).toDouble == 0.0, b1)
    } finally f.stop()
  }
}
