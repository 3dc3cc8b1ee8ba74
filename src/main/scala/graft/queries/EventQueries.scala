package graft.queries

import graft.Tables
import graft.pipeline.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-log shaping queries: gap sessionization and the per-key as-of
  * join of events against the metric series — both single-shuffle designs
  * (see [[graft.pipeline.EventOps]]), both with exact DuckDB oracles
  * (the as-of oracle uses DuckDB's native ASOF JOIN, `<=` variant).
  */
object EventQueries extends QueryModule {

  private val SER = Tables.seriesSql

  /** 30-minute inactivity gap — the classic web-analytics default. */
  private val Gap = 1800L

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** The canonical acquisition funnel over the synthetic event log. */
  private val FunnelSteps = Seq("signup", "view", "click", "purchase")

  /** Time-to-convert quantiles, shared by the Spark registration and
    * the oracle's UNNEST list so the two can't desync. */
  private val FunnelPs = Seq(0.5, 0.9)

  private def evTs(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("ts"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // bot/automation screen: per-user inter-arrival median + MAD (exact
    // type-1 selections), integer cross-multiplied regularity verdict —
    // scripted clients fire on timers, humans are bursty
    "events_bot_regularity" -> ((s, d) =>
      EventOps.botRegularity(ev(s, d))),

    // per-user ordered funnel times: signup -> view -> click -> purchase,
    // each step counting only at-or-after the previous one (one shuffle)
    "events_funnel_users" -> ((s, d) =>
      EventOps.funnelStages(evTs(s, d), FunnelSteps)),

    // the aggregate funnel dashboard: per step, users reaching it and
    // conversion vs step 1
    "events_funnel" -> ((s, d) =>
      EventOps.funnelReport(evTs(s, d), FunnelSteps)),

    // weekly cohort retention matrix with rates vs cohort size
    "events_retention" -> ((s, d) => EventOps.retention(evTs(s, d))),

    // per-transition time-to-convert quantiles (p50/p90 of t_k - t_{k-1}
    // over converting users) via the distinct-gap cumulative histogram —
    // exact without a user-scale per-step sort
    "events_funnel_timing" -> ((s, d) =>
      EventOps.funnelTiming(evTs(s, d), FunnelSteps, ps = FunnelPs)),

    // hot-key skew diagnostic: top-10 user_ids by event count with
    // share / cumulative share — the pre-join salting decision input
    "events_hotkeys" -> ((s, d) => EventOps.hotKeys(ev(s, d), "user_id")),
    // volume anomalies: per-type hourly counts z-scored against the
    // trailing 24-observed-hour baseline (|z| > 2.5; decimal-exact
    // window moments) — the ingest-outage / bot-spike monitor
    "events_anomaly_windows" -> ((s, d) =>
      EventOps.anomalyWindows(ev(s, d), zThresh = 2.5)),
    // engagement stickiness: exact DAU over trailing-7-day WAU per day
    "events_dau_stickiness" -> ((s, d) =>
      EventOps.dauStickiness(ev(s, d))),

    // semi-structured payloads: JSON prop extraction + per-type stats —
    // the "parse the event envelope" step every log pipeline runs
    "events_props_stats" -> ((s, d) =>
      ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          round(Sql.decAvg(col("k")) + lit(1e-9), 4).as("avg_k"))),

    // next-event transition matrix: the Markov view of user journeys
    // (which step follows which) — one per-user window bounded by the
    // user's event count, then a partial-aggregated global count
    "events_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),

    "events_sessionize" -> ((s, d) =>
      EventOps.sessionize(
        ev(s, d).select(col("user_id"),
          unix_timestamp(col("ts")).as("ts"), col("value")),
        Gap)),

    // each event picks the metric observation of ITS OWN series
    // (sid = event_type) with the greatest ts <= event ts
    "events_asof_metric" -> ((s, d) =>
      EventOps.asofJoin(
        ev(s, d).select(col("event_id"), col("event_type").as("sid"),
          unix_timestamp(col("ts")).as("ts")),
        Tables.series(s, d),
        "sid")
        .select("event_id", "sid", "ts", "asof_ts", "asof_value")),

    // interval join: per session, how many events (of ANY user) the
    // platform saw inside the session's [start, end] — the cross-entity
    // "what else happened while X was active" query. Bucketized equi-join
    // (see EventOps.intervalCount): no BroadcastNestedLoop, no cartesian,
    // scales out on the bucket key at any event volume.
    "events_interval_count" -> ((s, d) => {
      val e = ev(s, d).select(col("user_id"),
        unix_timestamp(col("ts")).as("ts"), col("value"))
      val sess = EventOps.sessionize(e, Gap)
        .select(col("user_id"), col("session_seq"),
          col("session_start").as("lo"), col("session_end").as("hi"))
      EventOps.intervalCount(sess, e.select("ts"), bucket = 3600L,
        idCols = Seq("user_id", "session_seq"))
    }),

    // SCD2 dimension history from the event changelog: per user, the
    // validity interval of each run of consecutive equal event types —
    // the as-of-lookup shape every CDC ingest compacts to (one shuffle)
    "events_scd2" -> ((s, d) =>
      EventOps.scd2History(
        ev(s, d).select(col("user_id"), unix_timestamp(col("ts")).as("ts"),
          col("event_type"), col("event_id")),
        key = "user_id", attr = "event_type", tieCol = "event_id")),

    // robust outlier screen: per event_type, rows whose |value − median|
    // exceeds 3× the median absolute deviation (exact lower medians)
    "events_mad_outliers" -> ((s, d) =>
      EventOps.madOutliers(ev(s, d), k = 3.0)),

    // reply-tree reconstruction over the injected forum-post fixture
    // (pointer doubling: O(log depth) join rounds, one deep mega-thread
    // planted by the fixture) — per post: root, depth, thread size
    "events_thread_assembly" -> ((s, d) =>
      EventOps.threadAssembly(EventOps.postsInject(ev(s, d)))),

    // root-to-leaf dialogue linearization (the DialoGPT corpus recipe):
    // one training dialogue per leaf, ≥3 turns, strict speaker
    // alternation, turns rendered "author: text"
    "text_dialogue_chains" -> ((s, d) =>
      EventOps.dialogueChains(EventOps.postsInject(ev(s, d)),
        minTurns = DialogueMinTurns)))

  /** Dialogue depth gate, shared by the registration and the oracle. */
  private val DialogueMinTurns = 3

  /** DuckDB replay of [[EventOps.postsInject]] — every literal
    * interpolates the SAME EventOps constants the Spark side reads (the
    * urlInject convention), so the two fixtures cannot desync. */
  private val postsCte = {
    import graft.pipeline.EventOps.{ThreadMegaMod, ThreadMegaResidue,
      ThreadRootMod, ThreadStepMod}
    s"""posts0 AS MATERIALIZED (SELECT event_id AS post_id,
       |    CASE WHEN event_id % $ThreadMegaMod = $ThreadMegaResidue THEN
       |           (CASE WHEN event_id - $ThreadMegaMod >= 0
       |                 THEN event_id - $ThreadMegaMod END)
       |         WHEN event_id % $ThreadRootMod = 0 THEN NULL
       |         ELSE (CASE WHEN event_id - 1 - (event_id % $ThreadStepMod) >= 0
       |               THEN event_id - 1 - (event_id % $ThreadStepMod) END)
       |    END AS parent_id,
       |    user_id AS author,
       |    event_type || '#' || CAST(event_id AS VARCHAR) AS text
       |  FROM events),
       |-- dangling-parent normalization (EventOps.normalizeParents): a
       |-- parent id absent from the post set nulls out, so the engine's
       |-- pointer walk and this recursive walk agree BY CONSTRUCTION
       |posts AS MATERIALIZED (SELECT p.post_id, v.post_id AS parent_id,
       |    p.author, p.text
       |  FROM posts0 p LEFT JOIN posts0 v ON v.post_id = p.parent_id)""".stripMargin
  }

  /** Shared funnel oracle CTE: c3 holds (user_id, t0..t3) with the same
    * sequential min-at-or-after chaining as [[EventOps.funnelStages]]
    * (a null threshold filters to an empty list → null, like Spark). */
  private val funnelCte = {
    val in = FunnelSteps.map(st => s"'$st'").mkString(", ")
    val arrays = FunnelSteps.zipWithIndex.map { case (st, k) =>
      s"list_sort(list(ts) FILTER (WHERE event_type = '$st')) AS a$k"
    }.mkString(",\n    ")
    val chain = FunnelSteps.indices.map { k =>
      if (k == 0) s"c0 AS (SELECT *, list_min(a0) AS t0 FROM u)"
      else s"c$k AS (SELECT *, list_min(list_filter(a$k, x -> x >= t${k - 1})) AS t$k FROM c${k - 1})"
    }.mkString(",\n")
    s"""WITH e AS (SELECT user_id, event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts
       |  FROM events WHERE event_type IN ($in)),
       |u AS (SELECT user_id,
       |    $arrays
       |  FROM e GROUP BY user_id),
       |$chain""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // the events_mad_outliers median recipe applied to per-user GAPS
    "events_bot_regularity" ->
      """WITH g0 AS (SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) -
        |      lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |g AS (SELECT user_id, event_id, gap FROM g0 WHERE gap IS NOT NULL),
        |meds AS (SELECT user_id, gap AS med_gap, n AS n_gaps FROM (
        |    SELECT user_id, gap, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY gap, event_id) AS rn,
        |      COUNT(*) OVER (PARTITION BY user_id) AS n
        |    FROM g) WHERE rn = (n + 1) // 2),
        |d AS (SELECT g.user_id, m.n_gaps, m.med_gap,
        |        abs(g.gap - m.med_gap) AS dev, g.event_id
        |      FROM g JOIN meds m USING (user_id)),
        |d2 AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                    ORDER BY dev, event_id) AS rn
        |       FROM d)
        |SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps, med_gap,
        |  dev AS mad_gap,
        |  CAST(CASE WHEN n_gaps >= 20 AND dev * 100 <= 10 * med_gap
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_bot
        |FROM d2 WHERE rn = (n_gaps + 1) // 2""".stripMargin,

    "events_mad_outliers" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events),
        |med AS (SELECT event_type, value AS med FROM (
        |    SELECT event_type, value,
        |      row_number() OVER (PARTITION BY event_type
        |                         ORDER BY value, event_id) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS n
        |    FROM e) WHERE rn = (n + 1) // 2),
        |d AS (SELECT e.event_type, e.event_id, e.value,
        |        abs(e.value - m.med) AS dev
        |      FROM e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev,
        |      row_number() OVER (PARTITION BY event_type
        |                         ORDER BY dev, event_id) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS n
        |    FROM d) WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, d.event_id, d.value,
        |  ROUND(d.dev + 1e-9, 4) AS dev
        |FROM d JOIN mad USING (event_type)
        |WHERE d.dev > 3.0 * mad.mad""".stripMargin,

    "events_funnel_users" -> {
      val last = s"c${FunnelSteps.size - 1}"
      val cols = FunnelSteps.zipWithIndex
        .map { case (st, k) => s"t$k AS t_$st" }.mkString(", ")
      val reached = FunnelSteps.indices
        .map(k => s"(CASE WHEN t$k IS NULL THEN 0 ELSE 1 END)").mkString(" + ")
      s"""$funnelCte
         |SELECT user_id, $cols, CAST($reached AS BIGINT) AS reached
         |FROM $last""".stripMargin
    },

    "events_funnel" -> {
      val last = s"c${FunnelSteps.size - 1}"
      val counts = FunnelSteps.indices.map(k => s"COUNT(t$k) AS c$k").mkString(", ")
      val rows = FunnelSteps.zipWithIndex.map { case (st, k) =>
        s"""SELECT CAST(${k + 1} AS BIGINT) AS step, '$st' AS step_name,
           |  c$k AS n_users,
           |  CASE WHEN c0 > 0
           |       THEN ROUND(CAST(c$k AS DOUBLE) / c0 + 1e-9, 4) END AS conversion
           |FROM f""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$funnelCte,
         |f AS (SELECT $counts FROM $last)
         |$rows""".stripMargin
    },

    "events_funnel_timing" -> {
      val last = s"c${FunnelSteps.size - 1}"
      // the per-transition UNION ALL reads the funnel chain 3x — pin a
      // MATERIALIZED copy so DuckDB doesn't re-run the corpus-scale
      // per-user aggregation per transition (the repo's CTE gotcha)
      val transitions = FunnelSteps.indices.tail.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS step, '${FunnelSteps(k)}' AS step_name,
           |  t$k - t${k - 1} AS gap FROM lastm WHERE t$k IS NOT NULL""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$funnelCte,
         |lastm AS MATERIALIZED (SELECT * FROM $last),
         |g AS ($transitions),
         |h AS (SELECT step, step_name, gap, COUNT(*) AS c
         |      FROM g GROUP BY step, step_name, gap),
         |cum AS (SELECT *,
         |    SUM(c) OVER (PARTITION BY step ORDER BY gap
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    SUM(c) OVER (PARTITION BY step) AS n FROM h)
         |SELECT step, step_name, p,
         |  CAST(MAX(n) AS BIGINT) AS n_conv, MIN(gap) AS gap_q
         |FROM cum CROSS JOIN (SELECT UNNEST([${
        FunnelPs.map(p => s"CAST('$p' AS DOUBLE)").mkString(",\n  ")
      }]) AS p)
         |WHERE cum >= CAST(ceil(p * n) AS BIGINT)
         |GROUP BY step, step_name, p""".stripMargin
    },

    "events_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id),
        |cells AS (SELECT cohort_wk, wk - cohort_wk AS offset_wk,
        |    COUNT(*) AS n_users
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_wk, n_users AS cohort_size FROM cells
        |      WHERE offset_wk = 0)
        |SELECT cohort_wk, offset_wk, n_users,
        |  ROUND(CAST(n_users AS DOUBLE) / cohort_size + 1e-9, 4) AS retention
        |FROM cells JOIN s USING (cohort_wk)""".stripMargin,

    "events_props_stats" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_events,
         |  MIN(k) AS min_k, MAX(k) AS max_k,
         |  ROUND(${Sql.decAvgSql("k")} + 1e-9, 4) AS avg_k
         |FROM e GROUP BY event_type""".stripMargin,

    "events_dau_stickiness" ->
      """WITH ud AS (SELECT DISTINCT
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
        |wexp AS (SELECT DISTINCT user_id, day + o AS wday
        |  FROM ud CROSS JOIN (SELECT UNNEST(range(0, 7)) AS o)),
        |wau AS (SELECT wday AS day, COUNT(*) AS wau FROM wexp GROUP BY wday)
        |SELECT dau.day, dau.dau, wau.wau,
        |  ROUND(CAST(dau.dau AS DOUBLE) / wau.wau + 1e-9, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,

    "events_anomaly_windows" ->
      s"""WITH h0 AS (SELECT event_type,
         |    (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_start,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT event_type,
         |    UNNEST(range(mn, mx + 3600, 3600)) AS win_start
         |  FROM (SELECT event_type, MIN(win_start) AS mn,
         |        MAX(win_start) AS mx FROM h0 GROUP BY event_type)),
         |h AS (SELECT g.event_type, g.win_start,
         |    CAST(COALESCE(h0.n, 0) AS BIGINT) AS n
         |  FROM g LEFT JOIN h0
         |    ON g.event_type = h0.event_type AND g.win_start = h0.win_start),
         |b AS (SELECT event_type, win_start, n,
         |    COUNT(*) OVER w AS bn,
         |    CAST(SUM(CAST(n AS DECIMAL(30,6))) OVER w AS DOUBLE) AS bs,
         |    CAST(SUM(CAST(n * n AS DECIMAL(30,6))) OVER w AS DOUBLE) AS bs2
         |  FROM h
         |  WINDOW w AS (PARTITION BY event_type ORDER BY win_start
         |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         |m AS (SELECT event_type, win_start, n, bs / bn AS mu,
         |    sqrt(bs2 / bn - (bs / bn) * (bs / bn)) AS sd
         |  FROM b WHERE bn >= 12),
         |z AS (SELECT event_type, win_start, n, mu,
         |    (CAST(n AS DOUBLE) - mu) / sd AS z
         |  FROM m WHERE sd > 0)
         |SELECT event_type, win_start, n,
         |  ROUND(mu + 1e-9, 4) AS base_mean, ROUND(z + 1e-9, 4) AS z
         |FROM z WHERE abs(z) > 2.5""".stripMargin,

    "events_hotkeys" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events
        |           GROUP BY user_id),
        |t AS (SELECT SUM(n) AS tot FROM c),
        |r AS (SELECT user_id, n,
        |        row_number() OVER (ORDER BY n DESC, user_id) AS rk,
        |        SUM(n) OVER (ORDER BY n DESC, user_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        |      FROM c)
        |SELECT user_id, n, rk,
        |  ROUND(CAST(n AS DOUBLE) / tot + 1e-9, 6) AS share,
        |  ROUND(CAST(cum_n AS DOUBLE) / tot + 1e-9, 6) AS cum_share
        |FROM r CROSS JOIN t WHERE rk <= 10""".stripMargin,

    "events_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts FROM events),
        |l AS (SELECT event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM e)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,

    // SUM(int) in DuckDB is HUGEINT -> cast session_seq back to BIGINT
    "events_sessionize" ->
      s"""WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts, value
         |           FROM events),
         |b AS (SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > $Gap
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_seq FROM b)
         |SELECT user_id, session_seq,
         |  MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  COUNT(*) AS n_events,
         |  ROUND(${Sql.decSumSql("value")}, 4) AS total_value
         |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    "events_asof_metric" ->
      s"""WITH series AS ($SER),
         |e AS (SELECT event_id, event_type AS sid,
         |        CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts FROM events)
         |SELECT e.event_id, e.sid, e.ts, m.ts AS asof_ts, m.value AS asof_value
         |FROM e ASOF LEFT JOIN series m
         |  ON e.sid = m.sid AND e.ts >= m.ts""".stripMargin,

    // the oracle states the SEMANTICS (a plain theta join) that the
    // engine's bucketized equi-join must reproduce exactly
    "events_interval_count" ->
      s"""WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts
         |           FROM events),
         |b AS (SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > $Gap
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_seq FROM b),
         |iv AS (SELECT user_id, session_seq, MIN(ts) AS lo, MAX(ts) AS hi
         |       FROM sess GROUP BY user_id, session_seq)
         |SELECT iv.user_id, iv.session_seq, iv.lo, iv.hi,
         |  CAST(COUNT(e.ts) AS BIGINT) AS n_events
         |FROM iv LEFT JOIN e ON e.ts BETWEEN iv.lo AND iv.hi
         |GROUP BY iv.user_id, iv.session_seq, iv.lo, iv.hi""".stripMargin,

    // upward ancestor walk per post (recursive CTE) — the declarative
    // SEMANTICS the engine's pointer-doubling must reproduce exactly
    "events_thread_assembly" ->
      s"""WITH RECURSIVE $postsCte,
         |anc AS (SELECT post_id, post_id AS cur, parent_id AS nxt,
         |    CAST(0 AS BIGINT) AS depth FROM posts
         |  UNION ALL
         |  SELECT a.post_id, p.post_id, p.parent_id, a.depth + 1
         |  FROM anc a JOIN posts p ON p.post_id = a.nxt),
         |fin AS (SELECT post_id, cur AS root_id, depth FROM anc
         |        WHERE nxt IS NULL),
         |tsz AS (SELECT root_id, COUNT(*) AS thread_size FROM fin
         |        GROUP BY root_id)
         |SELECT p.post_id, p.parent_id, f.root_id, f.depth, tsz.thread_size
         |FROM posts p JOIN fin f USING (post_id)
         |JOIN tsz USING (root_id)""".stripMargin,

    // same walk accumulating the rendered turn list root-first; leaves =
    // posts never seen as a parent; strict-alternation + min-turns gates
    "text_dialogue_chains" ->
      s"""WITH RECURSIVE $postsCte,
         |chain AS (SELECT post_id, post_id AS cur, parent_id AS nxt,
         |    [CAST(author AS VARCHAR) || ': ' || text] AS turns,
         |    [author] AS auth
         |  FROM posts
         |  UNION ALL
         |  SELECT c.post_id, p.post_id, p.parent_id,
         |    list_prepend(CAST(p.author AS VARCHAR) || ': ' || p.text, c.turns),
         |    list_prepend(p.author, c.auth)
         |  FROM chain c JOIN posts p ON p.post_id = c.nxt),
         |fin AS (SELECT post_id AS leaf_id, cur AS root_id, turns, auth
         |        FROM chain WHERE nxt IS NULL),
         |lv AS (SELECT f.* FROM fin f
         |  WHERE leaf_id NOT IN (SELECT parent_id FROM posts
         |                        WHERE parent_id IS NOT NULL))
         |SELECT leaf_id, root_id,
         |  CAST(len(turns) AS BIGINT) AS n_turns,
         |  CAST(len(list_distinct(auth)) AS BIGINT) AS n_speakers,
         |  array_to_string(turns, ' | ') AS dialogue
         |FROM lv
         |WHERE len(turns) >= $DialogueMinTurns
         |  AND len(list_filter(range(1, len(auth)),
         |        i -> auth[i] <> auth[i + 1])) = len(auth) - 1""".stripMargin,

    // window functions evaluate after WHERE, so the lead() in r runs
    // over the change rows only — same as the engine's filter-then-lead
    "events_scd2" ->
      """WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts,
        |    event_type, event_id FROM events),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |        OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM c WHERE chg = 1)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM r""".stripMargin)
}
