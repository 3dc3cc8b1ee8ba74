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
}
