package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.metrics.{AggOps, MetricOps}
import graft.models.{ArEnsemble, CapacityModel, Cluster1D, GbtLocal, LatencyGbt, RecoveryOps, TwresModel}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

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
  *  - POST /latency/training      → M3 GBT fit + M4 two-cluster latency
  *    labeling, append-aware (latency/routes.py:21-32, models.py:87-113)
  *  - POST /latency/prediction    → predicted latency + class per
  *    scale-out in [min, max] (latency/models.py:139-147)
  *  - POST /latency/evaluation    → same over a supplied candidate set at
  *    the predicted throughput (latency/models.py:126-137)
  *  - POST /recoverytime/training → M2 capacity ridge fit
  *    (recoverytime/routes.py:22-31)
  *  - POST /recoverytime/prediction → M5 Simpson catch-up per scale-out +
  *    M12 finalization + A7 binned-peak + M7 slope of the forecast
  *    (recoverytime/models.py:72-131)
  *  - POST /recoverytime/evaluation → same over a supplied candidate set
  *    (recoverytime/models.py:119-125)
  *  - GET  /common/tasks/{hash}   → still-running poll (common/routes.py:20-24)
  *
  * Documented deviations: training runs synchronously (see above); the
  * recovery-time workload model is fitted per request from the request's
  * own series (the reference holds a separately-fitted workload
  * singleton); latency classes for NEW points split at the midpoint of
  * the two fitted cluster means (the deterministic 1-D analog of Birch
  * nearest-centroid assignment), with the clusters themselves fitted by
  * the engine's own [[Cluster1D.twoMeansOn]].
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

  /** Fitted latency model (reference LatencyModelImpl state): training
    * rows for append=true refits, the boosted trees, the raw-latency
    * class boundary (midpoint of the two cluster means — the
    * deterministic analog of Birch nearest-centroid assignment for new
    * points), and per-cluster (num, min, max). */
  private final case class LatencyState(
      rows: Seq[(Double, Double, Double)], // (scaleout, throughput, latency)
      model: GbtLocal.Model,
      clusterBoundary: Double,
      clusters: Seq[(Int, Long, Double, Double)])

  /** One finalized (scale_out, value, is_best, is_valid) row — the
    * ResponseFinalizer output shape (common/schemes.py:30-68). The
    * DataFrame twin of this contract is [[RecoveryOps.finalize]] (used
    * by the recovery routes, whose candidates come out of a distributed
    * catch-up); keep the two in sync if the finalization contract ever
    * changes. This driver form serves the latency routes, whose
    * candidate set is a ≤ max-scale-out driver Seq to begin with. */
  private def finalizeCandidates(
      tuples: Seq[(Int, Double, Double)], // (scale_out, validation value, reported value)
      currentScaleOut: Int, restriction: Double,
      previouslyValid: Set[Int]): (Seq[(Int, Double, Boolean, Boolean)], Int) = {
    val sorted = tuples.sortBy(_._1)
    val idx = sorted.indexWhere(_._1 == currentScaleOut)
    if (idx < 0) throw new IllegalStateException(
      s"current scale-out $currentScaleOut is not among the candidates")
    val valid = sorted.map { case (so, v, _) => v < restriction && previouslyValid(so) }
    val bestIdx = valid.indexWhere(identity)
    (sorted.zipWithIndex.map { case ((so, _, rep), i) =>
      (so, rep, i == bestIdx, valid(i)) }, idx)
  }

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  private def confJson(so: Int, valueName: String, value: Double,
                       isBest: Boolean, isValid: Boolean): String =
    s"""{"scale_out": $so, "$valueName": ${round2(value)}, "is_best": $isBest, "is_valid": $isValid}"""

  def start(spark: SparkSession, port: Int = 0, models: Int = 20): Facade = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // job -> fitted TWRES coefficients; hash -> still-running flag
    val twresCoeffs = new ConcurrentHashMap[String, Array[Double]]()
    val tasks = new ConcurrentHashMap[String, Boolean]()
    // singleton model states, reference provider parity (lru_cache get_instance)
    val latencyState = new AtomicReference[LatencyState](null)
    val capacityFit = new AtomicReference[Row](null) // (alpha, slope, intercept, score)

    def route(path: String)(handle: String => (Int, String)): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        // every handler materializes its response before returning, so a
        // per-request CacheScope releases any engine-internal persist
        // (e.g. twoMeansOn's window base inside /latency/training) —
        // without it a long-lived facade pins one RDD per training call
        val (code, resp) = try graft.CacheScope.scoped { handle(body) } catch {
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

    /** Bounds/step of the request's workload TimeSeries — the preamble
      * every forecasting route shares: (series, last ts, n, step), with
      * the reference's degenerate-timestamp fallback (TimeSeries
      * .step_size is never 0 — it divides below). */
    def workloadSeries(req: DataFrame): (DataFrame, Long, Long, Long) = {
      val series = seriesOf(req, "workload")
      val bounds = series.agg(min("ts"), max("ts"), count(lit(1))).head
      val n = bounds.getLong(2)
      if (n == 0) throw new IllegalStateException("workload has no observations")
      val (t0, t1) = (bounds.getLong(0), bounds.getLong(1))
      val step = math.max(1L, if (n <= 1) 1L else (t1 - t0) / (n - 1))
      (series, t1, n, step)
    }

    /** The reference's 412 guard on the forecasting horizon. */
    def requirePeriod(periodS: Long, step: Long): Unit =
      if (periodS > models * step)
        throw new IllegalStateException(
          s"${periodS}s exceeds maximum forecasting period (${models * step}s)")

    route("/workload/prediction") { body =>
      val req = parse(spark, body)
      val (series, t1, _, step) = workloadSeries(req)
      val periodS = req.select(col("prediction_period_in_s").cast("long")).head.getLong(0)
      requirePeriod(periodS, step)
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
      val (series, _, _, step) = workloadSeries(req)
      // no period 412 here: the reference's baseline route instead caps
      // the horizon at the model count (baselines/models.py:57-66)
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

    route("/latency/training") { body =>
      import spark.implicits._
      val req = parse(spark, body)
      val fresh = req.select(explode(arrays_zip(
          col("scale_outs"), col("throughput_rates"), col("latencies"))).as("z"))
        .select(col("z.scale_outs").cast("double"),
          col("z.throughput_rates").cast("double"), col("z.latencies").cast("double"))
        .as[(Double, Double, Double)].collect().toSeq
      val append = req.schema.fieldNames.contains("append") && {
        val r = req.select(col("append").cast("boolean")).head
        !r.isNullAt(0) && r.getBoolean(0)
      }
      val prev = latencyState.get()
      val rows = (if (append && prev != null) prev.rows else Nil) ++ fresh
      if (rows.size < 2)
        throw new IllegalStateException("latency training needs >= 2 rows")
      // M4 clustering: robust-log transform + exact 1-D 2-means; label 0
      // holds the smaller latencies (the reference's correct_label order)
      val ydf = rows.map(_._3).toDF("y").withColumn("g", lit(0))
      val labeled = Cluster1D.twoMeansOn(
          Cluster1D.robustLogTransform(ydf.select(col("g"), col("y")), Seq("g")), Seq("g"))
        .select(col("y").cast("double"), col("label").cast("int"))
        .as[(Double, Int)].collect()
      val clusters = labeled.groupBy(_._2).toSeq.sortBy(_._1).map { case (lbl, vs) =>
        (lbl, vs.length.toLong, vs.map(_._1).min, vs.map(_._1).max) }
      // class boundary for NEW latencies: midpoint of the raw cluster
      // means (nearest-centroid for two 1-D clusters; GBT shrinkage can
      // pull predictions well inside the inter-cluster gap, so the split
      // point itself would be too tight a boundary)
      val byLabel = labeled.groupBy(_._2)
      def meanOf(lbl: Int) = { val v = byLabel(lbl).map(_._1); v.sum / v.length }
      val boundary =
        if (byLabel.size < 2) Double.MaxValue else (meanOf(0) + meanOf(1)) / 2
      // M3 regression: boosted trees, driver fit on deterministic order
      val train = rows.sorted
      val m = GbtLocal.fit(train.map(r => Array(r._1, r._2)).toArray,
        train.map(_._3).toArray, LatencyGbt.numTrees(train.size.toLong))
      latencyState.set(LatencyState(rows, m, boundary, clusters))
      val hash = md5Hex(body)
      tasks.put(hash, false)
      (200, taskResponse(s"Latency training finished: ${rows.size} rows, clusters " +
        clusters.map(c => s"${c._1}(n=${c._2}, min=${c._3}, max=${c._4})").mkString(", "),
        hash))
    }

    /** Predicted latency + cluster class per scale-out candidate, the
      * ResponseFinalizer envelope (restriction 1: valid = low cluster). */
    def latencyRespond(st: LatencyState, tuples: Seq[(Int, Double)],
                       currentSo: Int, previouslyValid: Set[Int]): (Int, String) = {
      val withClass = tuples.map { case (so, thr) =>
        val lat = st.model.predict(Array(so.toDouble, thr))
        val label = if (lat > st.clusterBoundary) 1.0 else 0.0
        (so, label, lat)
      }
      val (cands, curIdx) = finalizeCandidates(withClass, currentSo, 1.0, previouslyValid)
      val js = cands.map { case (so, lat, best, valid) =>
        confJson(so, "latency", lat, best, valid) }
      (200, s"""{"current": ${js(curIdx)}, "candidates": [${js.mkString(", ")}]}""")
    }

    route("/latency/prediction") { body =>
      val st = latencyState.get()
      if (st == null) throw new IllegalStateException("LatencyModel has not been fitted!")
      val r = parse(spark, body).select(col("min_scale_out").cast("int"),
        col("max_scale_out").cast("int"), col("scale_out").cast("int"),
        col("throughput_rate").cast("double")).head
      val range = r.getInt(0) to r.getInt(1)
      latencyRespond(st, range.map(so => so -> r.getDouble(3)), r.getInt(2), range.toSet)
    }

    route("/latency/evaluation") { body =>
      import spark.implicits._
      val st = latencyState.get()
      if (st == null) throw new IllegalStateException("LatencyModel has not been fitted!")
      val req = parse(spark, body)
      val cands = req.select(explode(col("candidates")).as("c"))
        .select(col("c.scale_out").cast("int"), col("c.is_valid").cast("boolean"))
        .as[(Int, Boolean)].collect().toSeq
      val thr = req.select(col("predicted_throughput_rate").cast("double")).head.getDouble(0)
      val currentSo = req.select(col("current.scale_out").cast("int")).head.getInt(0)
      // drop duplicate scale-outs, first occurrence wins for BOTH the
      // candidate row and its is_valid flag (models.py:131 semantics —
      // a later duplicate must not resurrect validity)
      val firstOcc = cands.distinctBy(_._1)
      latencyRespond(st, firstOcc.map { case (so, _) => so -> thr }, currentSo,
        firstOcc.filter(_._2).map(_._1).toSet)
    }

    route("/recoverytime/training") { body =>
      val req = parse(spark, body)
      val train = req.select(explode(arrays_zip(
          col("scale_outs"), col("max_throughput_rates"))).as("z"))
        .select(col("z.scale_outs").cast("long").as("scaleout"),
          col("z.max_throughput_rates").cast("double").as("y"))
      capacityFit.set(CapacityModel.fit(train).head)
      val hash = md5Hex(body)
      tasks.put(hash, false)
      (200, taskResponse("Capacity training finished", hash))
    }

    /** Shared M5 flow: forecast the request workload, Simpson catch-up
      * per candidate scale-out against the fitted capacity, finalize,
      * plus the A7 binned forecast peak and M7 forecast slope. */
    def recoveryRespond(req: DataFrame, sos: Seq[Int], currentSo: Int,
                        previouslyValid: Set[Int]): (Int, String) = {
      import spark.implicits._
      val fit = capacityFit.get()
      if (fit == null)
        throw new IllegalStateException("RecoveryTimeModel has not been fitted!")
      val (series, t1, _, step) = workloadSeries(req)
      val p = req.select(col("prediction_period_in_s").cast("long"),
        col("downtime").cast("double"), col("last_checkpoint").cast("double"),
        col("max_recovery_time").cast("double")).head
      requirePeriod(p.getLong(0), step)
      val horizon = math.max(1L, p.getLong(0) / step).toInt
      val binCount =
        if (req.schema.fieldNames.contains("bin_count"))
          req.select(col("bin_count").cast("int")).head.getInt(0)
        else 4
      val fut = blended(series, models, horizon)
        .filter(col("blend").isNotNull)
        .select((lit(t1) + col("step").cast("long") * step).as("ts"),
          col("blend").as("value"))
        .persist() // read by the catch-up union, the binned peak, and the slope
      try {
        if (fut.head(1).isEmpty) throw new IllegalStateException(
          "workload too short to forecast (every model's design is incomplete)")
        val fitted = Seq((fit.getDouble(0), fit.getDouble(1), fit.getDouble(2)))
          .toDF("alpha", "slope", "intercept")
        val cap = CapacityModel.predict(spark, fitted, sos.min, sos.max)
          .filter(col("scaleout").isin(sos.map(_.toLong): _*))
        val cands = RecoveryOps.catchUp(spark, series.unionByName(fut), cap,
          t1, step, p.getDouble(2).toLong, p.getDouble(1))
        val fin = RecoveryOps.finalize(cands, p.getDouble(1), p.getDouble(3),
            currentSo, Some(previouslyValid.toSeq.sorted.map(_.toLong)))
          .select(col("scaleout").cast("int"), col("recovery_time").cast("double"),
            col("is_best"), col("is_valid"), col("is_current"))
          .orderBy("scaleout").collect()
        val js = fin.map(r => confJson(r.getInt(0), "recovery_time", r.getDouble(1),
          r.getBoolean(2), r.getBoolean(3)))
        val curIdx = fin.indexWhere(_.getBoolean(4))
        if (curIdx < 0) throw new IllegalStateException(
          s"current scale-out $currentSo is not among the candidates")
        val sid = fut.withColumn("sid", lit("forecast"))
        val ptr = AggOps.binnedMeans(sid, binCount)
          .agg(max(col("mean_value"))).head.getDouble(0)
        // a 1-point forecast (horizon 1) is a singular design: the M7 fit
        // null-guards its slope — report 0 instead of 500ing on the null
        val slope = MetricOps.slopeIntercept(sid)
          .select(col("slope").cast("double")).collect()
          .headOption.filter(!_.isNullAt(0)).map(_.getDouble(0)).getOrElse(0.0)
        (200, s"""{"current": ${js(curIdx)}, "candidates": [${js.mkString(", ")}], """ +
          s""""predicted_throughput_rate": $ptr, "slope": $slope}""")
      } finally fut.unpersist()
    }

    route("/recoverytime/prediction") { body =>
      val req = parse(spark, body)
      val r = req.select(col("min_scale_out").cast("int"),
        col("max_scale_out").cast("int"), col("scale_out").cast("int")).head
      val range = r.getInt(0) to r.getInt(1)
      recoveryRespond(req, range, r.getInt(2), range.toSet)
    }

    route("/recoverytime/evaluation") { body =>
      import spark.implicits._
      val req = parse(spark, body)
      val cands = req.select(explode(col("candidates")).as("c"))
        .select(col("c.scale_out").cast("int"), col("c.is_valid").cast("boolean"))
        .as[(Int, Boolean)].collect().toSeq
      val currentSo = req.select(col("current.scale_out").cast("int")).head.getInt(0)
      // first occurrence of a duplicate scale-out owns its is_valid flag
      val firstOcc = cands.distinctBy(_._1)
      recoveryRespond(req, firstOcc.map(_._1).sorted, currentSo,
        firstOcc.filter(_._2).map(_._1).toSet)
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
