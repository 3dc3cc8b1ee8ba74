package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.metrics.MetricOps
import graft.models.{ArEnsemble, TwresModel}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** SURVEY §3.4 — the reference analytics service's REST façade
  * (analytics/app/{workload,baselines,common}/routes.py), as a thin
  * JDK-HttpServer layer over the Spark engine. No web framework: the
  * routes are a control plane hit once per optimize tick, so each handler
  * parses its JSON body WITH SPARK (`spark.read.json` — the engine's own
  * codec, same as the Kafka wiring) and answers from the corresponding
  * engine operator. Training runs synchronously (the reference offloads
  * to FastAPI background tasks and exposes a poll route; the poll route
  * here reports completed hashes).
  *
  * Routes (reference parity):
  *  - POST /workload/prediction   → M1 ensemble forecast + A17 blend,
  *    horizon capped at models·step (workload/routes.py:19-38)
  *  - POST /common/regression     → M7 slope/intercept per named series
  *    (common/routes.py:27-47)
  *  - POST /baselines/twres_training   → M6 NNLS fit per job
  *    (baselines/routes.py:21-32)
  *  - POST /baselines/twres_prediction → TWRES decision over the M1
  *    forecast of the request workload (baselines/models.py:57-77)
  *  - GET  /common/tasks/{hash}   → still-running poll (common/routes.py:20-24)
  */
object RestFacade {

  /** JSON string escape (same treatment as graft.Verify's oracle dump):
    * backslash, quote, and all control chars — error messages carry
    * quotes and newlines and would otherwise emit malformed JSON. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** message+hash envelope (common/schemes.py ScheduledTaskResponse). */
  private def taskResponse(msg: String, hash: String): String =
    s"""{"message": ${jstr(msg)}, "task_hash": "$hash"}"""

  final case class Facade(server: HttpServer, port: Int) {
    def stop(): Unit = server.stop(0)
    def url(path: String): String = s"http://127.0.0.1:$port$path"
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Parse one JSON document with the engine's own reader. */
  private def parse(spark: SparkSession, body: String): DataFrame =
    spark.read.json(spark.createDataset(Seq(body))(Encoders.STRING))

  /** (ts, value) series from a TimeSeries JSON column (`observations`
    * array of {timestamp, value}). */
  private def seriesOf(df: DataFrame, tsCol: String): DataFrame =
    df.select(explode(col(s"$tsCol.observations")).as("o"))
      .select(col("o.timestamp").cast("long").as("ts"),
        col("o.value").cast("double").as("value"))

  /** Blended M1 forecast of `series` for `horizon` steps. Returns
    * (step, blend) rows. */
  private def blended(series: DataFrame, models: Int, horizon: Int): DataFrame =
    ArEnsemble.blendForecast(
      ArEnsemble.fitForecast(series, models, horizon), models, horizon)

  def start(spark: SparkSession, port: Int = 0, models: Int = 20): Facade = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // job -> fitted TWRES coefficients; hash -> still-running flag
    val twresCoeffs = new ConcurrentHashMap[String, Array[Double]]()
    val tasks = new ConcurrentHashMap[String, Boolean]()

    def route(path: String)(handle: String => (Int, String)): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val (code, resp) = try handle(body) catch {
          case e: IllegalStateException =>
            (412, s"""{"detail": ${jstr(String.valueOf(e.getMessage))}}""")
          case e: Throwable =>
            (500, s"""{"detail": ${jstr(String.valueOf(e.getMessage))}}""")
        }
        val bytes = resp.getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })

    route("/workload/prediction") { body =>
      val req = parse(spark, body)
      val series = seriesOf(req, "workload")
      val bounds = series.agg(min("ts"), max("ts"), count(lit(1))).head
      val n = bounds.getLong(2)
      if (n == 0) throw new IllegalStateException("workload has no observations")
      val (t0, t1) = (bounds.getLong(0), bounds.getLong(1))
      // duplicate/degenerate timestamps: fall back to step 1 like the
      // reference's TimeSeries.step_size (never 0 — it divides below)
      val step = math.max(1L, if (n <= 1) 1L else (t1 - t0) / (n - 1))
      val periodS = req.select(col("prediction_period_in_s").cast("long")).head.getLong(0)
      if (periodS > models * step)
        throw new IllegalStateException(
          s"${periodS}s exceeds maximum forecasting period (${models * step}s)")
      val horizon = math.max(1L, periodS / step).toInt
      val obs = blended(series, models, horizon)
        .select(col("step").cast("long"), col("blend")).orderBy("step").collect()
        .map(r => s"""{"timestamp": ${t1 + r.getLong(0) * step}, "value": ${r.getDouble(1)}}""")
      (200, s"""{"workload": {"observations": [${obs.mkString(", ")}], "count": ${obs.length}}}""")
    }

    route("/common/regression") { body =>
      val req = parse(spark, body)
      val names = req.schema.fieldNames.toSeq.sorted
      val series = names.map(nm => seriesOf(req, nm).withColumn("sid", lit(nm)))
        .reduce(_ unionByName _)
      val fits = MetricOps.slopeIntercept(series)
        .select(col("sid"), col("slope").cast("double"), col("intercept").cast("double"))
        .collect()
        .map(r => r.getString(0) ->
          s""""${r.getString(0)}": {"slope": ${r.getDouble(1)}, "intercept": ${r.getDouble(2)}}""")
        .toMap
      // a top-level field with no fit row (not a series, or <2 non-null
      // points) is a client-data error, not an opaque 500
      val unfit = names.filterNot(fits.contains)
      if (unfit.nonEmpty) throw new IllegalStateException(
        s"series not fittable (need >=2 non-null observations): ${unfit.mkString(", ")}")
      (200, names.map(fits).mkString("{", ", ", "}"))
    }

    route("/baselines/twres_training") { body =>
      val req = parse(spark, body)
      val job = req.select(col("job").cast("string")).head.getString(0)
      val train = req.select(explode(arrays_zip(
          col("scale_outs"), col("throughput_rates"))).as("z"))
        .select(col("z.scale_outs").cast("int").as("scaleout"),
          col("z.throughput_rates").cast("double").as("y"))
      twresCoeffs.put(job, TwresModel.fit(train))
      val hash = md5Hex(body)
      tasks.put(hash, false) // trained synchronously: not running anymore
      (200, taskResponse(s"TWRES training finished for job $job", hash))
    }

    route("/baselines/twres_prediction") { body =>
      val req = parse(spark, body)
      val job = req.select(col("job").cast("string")).head.getString(0)
      val coeffs = twresCoeffs.get(job)
      if (coeffs == null)
        throw new IllegalStateException(s"TWRESModel has not been fitted for job $job")
      val r = req.select(col("avg_latency").cast("double"),
        col("max_latency_constraint").cast("double"), col("scale_out").cast("int"),
        col("time_window_interval").cast("double"), col("min_scale_out").cast("int"),
        col("max_scale_out").cast("int")).head
      val series = seriesOf(req, "workload")
      val bounds = series.agg(min("ts"), max("ts"), count(lit(1))).head
      if (bounds.getLong(2) == 0)
        throw new IllegalStateException("workload has no observations")
      val step = math.max(1L, if (bounds.getLong(2) <= 1) 1L
        else (bounds.getLong(1) - bounds.getLong(0)) / (bounds.getLong(2) - 1))
      val horizon = math.max(1L, math.min(models.toLong,
        math.ceil(r.getDouble(3) / step).toLong)).toInt
      // predicted load = Σ of the blended forecast over the interval
      // (baselines/models.py:60-66)
      val predRow = blended(series, models, horizon).agg(sum(col("blend"))).head
      if (predRow.isNullAt(0))
        throw new IllegalStateException(
          "workload too short to forecast (every model's design is incomplete)")
      val predLoad = predRow.getDouble(0)
      val newSo = TwresModel.decide(spark, coeffs,
          minSo = r.getInt(4), maxSo = r.getInt(5), interval = r.getDouble(3),
          predLoad = predLoad, currentScaleOut = r.getInt(2),
          avgLat = r.getDouble(0), maxLat = r.getDouble(1))
        .select(col("new_scale_out")).head.getLong(0)
      (200, s"""{"scale_out": $newSo}""")
    }

    server.createContext("/common/tasks", (ex: HttpExchange) => {
      val hash = ex.getRequestURI.getPath.stripPrefix("/common/tasks/").trim
      val running = tasks.getOrDefault(hash, false)
      val bytes = running.toString.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })

    server.setExecutor(null)
    server.start()
    Facade(server, server.getAddress.getPort)
  }
}
