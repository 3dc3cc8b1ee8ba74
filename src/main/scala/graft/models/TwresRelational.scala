package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M6 — the TWRES NNLS baseline, fully relational and oracle-exact.
  *
  * The reference fits MST(x) ≈ c·[1, x, 1/x, 1/x²] with scipy.optimize.nnls
  * (reference analytics/app/baselines/models.py:32-46). Lawson–Hanson is
  * data-dependent control flow, but for a FIXED 4-feature map the NNLS
  * optimum has a finite closed form: for each of the 16 subsets of "free"
  * coefficients solve the reduced normal equations (Cramer); the NNLS
  * optimum's own active set makes it one of the all-nonnegative candidates,
  * and every such candidate is a feasible point of the convex program, so
  * the minimum-SSE feasible candidate IS the NNLS solution. The whole fit
  * is then one distributed aggregation (exact normal-equation moments) plus
  * a one-row double-precision expression chain whose text is shared
  * string-for-string with the DuckDB oracle — bit-identical by
  * construction.
  *
  * FP discipline: features are quantized to 6 decimals (F_i = round(f_i·1e6)
  * as integer literals per scaleout) and y to 4 decimals (Y = round(y·1e4)
  * as BIGINT), so every moment is an exact integer aggregate (HUGEINT in
  * DuckDB, DECIMAL(38,0) in Spark); only the Cramer chain runs in doubles,
  * and both engines evaluate the same IEEE expression text on identical
  * inputs.
  *
  * Scale: the moments are a partial-aggregating groupBy over the training
  * rows (any row count); everything after is O(1).
  */
object TwresRelational {

  /** Scoring/decision parameters, with the double-typed ones carried as
    * SQL literal TEXT so Spark and DuckDB parse the identical token. */
  final case class Conf(
      minSo: Int = 2, maxSo: Int = 24, currentSo: Int = 8,
      intervalSql: String = "600e0", predLoadSql: String = "1.45e8",
      avgLatSql: String = "300e0", maxLatSql: String = "250e0")

  // ------------------------------------------------------------ features --

  /** Integer-quantized feature row for scale-out x:
    * [1, x, 1/x, 1/x²] · 1e6, rounded half-up. */
  def feats(x: Int): Seq[Long] = Seq(
    1000000L, x * 1000000L, math.round(1e6 / x), math.round(1e6 / (x.toLong * x)))

  private def featRows(minSo: Int, maxSo: Int): Seq[(Long, Long, Long, Long, Long)] =
    (minSo to maxSo).map { x =>
      val f = feats(x); (x.toLong, f(0), f(1), f(2), f(3))
    }

  /** DuckDB literal table of the quantized features. */
  private def featsSql(conf: Conf): String =
    featRows(conf.minSo, conf.maxSo)
      .map { case (x, f0, f1, f2, f3) => s"($x, $f0, $f1, $f2, $f3)" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") t(scaleout, ff0, ff1, ff2, ff3)")

  // ------------------------------------------------------------- moments --

  /** One-row frame of exact normal-equation moments, cast to DOUBLE:
    * m_ij = Σ cnt(x)·F_i(x)·F_j(x) (i ≤ j), r_i = Σ sy(x)·F_i(x),
    * syy = Σ Y². Grouping by scaleout first keeps every sum exact; all
    * integer products are carried as DECIMAL(38,0) (Y² alone exceeds
    * BIGINT for y beyond ~3e5). */
  def fitMoments(train: DataFrame, conf: Conf = Conf()): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val featDf = featRows(conf.minSo, conf.maxSo)
      .toDF("scaleout", "ff0", "ff1", "ff2", "ff3")
    // Y = round-half-up(y·1e4) via the decimal cast (same rule as DuckDB's
    // DECIMAL cast), carried as an exact long
    val yq = (col("y").cast(DecimalType(18, 4)) * 10000).cast("long")
    val g = train
      .groupBy(col("scaleout").cast("long").as("scaleout"))
      .agg(count(lit(1)).as("cnt"),
        sum(yq.cast(DecimalType(30, 0))).as("sy"),
        sum(yq.cast(DecimalType(38, 0)) * yq).as("syy_g"))
      .join(broadcast(featDf), Seq("scaleout"))
    val mAggs = for { i <- 0 to 3; j <- i to 3 } yield
      sum((col(s"ff$i") * col(s"ff$j")).cast(DecimalType(38, 0)) * col("cnt"))
        .cast("double").as(s"m$i$j")
    val rAggs = (0 to 3).map(i =>
      sum(col("sy").cast(DecimalType(38, 0)) * col(s"ff$i")).cast("double").as(s"r$i"))
    val aggs = mAggs.toSeq ++ rAggs :+ sum(col("syy_g")).cast("double").as("syy")
    g.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB CTEs producing the identical one-row moments from `train`
    * (HUGEINT arithmetic — exact, like Spark's DECIMAL(38,0)). */
  private def momentsCtes(trainSql: String, conf: Conf): String = {
    val mSel = (for { i <- 0 to 3; j <- i to 3 } yield
      s"CAST(SUM(CAST(ff$i AS HUGEINT) * ff$j * cnt) AS DOUBLE) AS m$i$j").mkString(",\n    ")
    val rSel = (0 to 3)
      .map(i => s"CAST(SUM(CAST(sy AS HUGEINT) * ff$i) AS DOUBLE) AS r$i").mkString(",\n    ")
    s"""train AS MATERIALIZED ($trainSql),
       |feats AS (${featsSql(conf)}),
       |tq AS (SELECT scaleout,
       |    CAST(CAST(y AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yq
       |  FROM train),
       |gm AS MATERIALIZED (SELECT scaleout, COUNT(*) AS cnt,
       |    SUM(yq) AS sy,
       |    SUM(CAST(yq AS HUGEINT) * yq) AS syy_g
       |  FROM tq GROUP BY scaleout),
       |mom AS MATERIALIZED (SELECT
       |    $mSel,
       |    $rSel,
       |    CAST(SUM(syy_g) AS DOUBLE) AS syy
       |  FROM gm JOIN feats USING (scaleout))""".stripMargin
  }

  // --------------------------------------------------- closed-form chain --

  private def mName(i: Int, j: Int): String = if (i <= j) s"m$i$j" else s"m$j$i"

  /** Cofactor-expansion determinant over expression names (k ≤ 4 here, so
    * the generated string stays small). */
  private[models] def detSql(rows: Seq[Seq[String]]): String =
    if (rows.size == 1) rows.head.head
    else rows.head.zipWithIndex.map { case (e, j) =>
      val minor = rows.tail.map(r => r.indices.filterNot(_ == j).map(r))
      val term = s"($e)*(${detSql(minor)})"
      if (j % 2 == 0) s"+ $term" else s"- $term"
    }.mkString("(", " ", ")")

  /** Free-coefficient index sets for subset masks 0..15. */
  private val subsets: Seq[Seq[Int]] =
    (0 until 16).map(m => (0 until 4).filter(i => (m & (1 << i)) != 0))

  /** The shared double-precision expression chain: moments → per-subset
    * Cramer solves → feasibility/SSE → argmin pick → c0..c3 and the TWRES
    * decision. Each inner Seq is one dependency level (expressions may
    * reference names from strictly earlier levels). */
  def chainLevels(conf: Conf): Seq[Seq[(String, String)]] = {
    val dets = subsets.zipWithIndex.map { case (free, si) =>
      val d =
        if (free.isEmpty) "1e0"
        else detSql(free.map(i => free.map(j => mName(i, j))))
      s"det_$si" -> d
    }
    val cns = subsets.zipWithIndex.flatMap { case (free, si) =>
      (0 to 3).map { i =>
        val e =
          if (!free.contains(i)) "0e0"
          else {
            val k = free.indexOf(i)
            val rep = free.map(a => free.indices.map(b =>
              if (b == k) s"r$a" else mName(a, free(b))))
            // b solves M·b = r in (F=1e6·f, Y=1e4·y) units; the original-
            // unit coefficient is c = (1e6/1e4)·b = 1e2·b
            s"1e2 * ${detSql(rep)} / det_$si"
          }
        s"cn${i}_$si" -> e
      }
    }
    val feasSse = subsets.indices.flatMap { si =>
      val feas =
        if (subsets(si).isEmpty) "TRUE"
        else s"det_$si <> 0e0 AND cn0_$si >= 0e0 AND cn1_$si >= 0e0" +
          s" AND cn2_$si >= 0e0 AND cn3_$si >= 0e0"
      Seq(
        s"feas_$si" -> feas,
        // SSE in scaled units (·1e8): syy − b·r = syy − Σ (cn_i/1e2)·r_i.
        // The fixed scale factor preserves the argmin across subsets.
        s"sse_$si" -> s"syy - (cn0_$si*r0 + cn1_$si*r1 + cn2_$si*r2 + cn3_$si*r3)*1e-2")
    }
    val bestSse = Seq("best_sse" -> subsets.indices
      .map(si => s"CASE WHEN feas_$si THEN sse_$si ELSE 1e308 END")
      .mkString("least(", ", ", ")"))
    val bestS = Seq("best_s" -> subsets.indices
      .map(si => s"WHEN feas_$si AND sse_$si = best_sse THEN $si")
      .mkString("CASE ", " ", " END"))
    val cs = (0 to 3).map(i => s"c$i" -> subsets.indices
      .map(si => s"WHEN $si THEN cn${i}_$si")
      .mkString("CASE best_s ", " ", " END"))
    val cur = conf.currentSo
    val decide = Seq(
      "mstw_cur" ->
        s"(c0 + c1*${cur}e0 + c2/${cur}e0 + c3/${cur * cur}e0) * ${conf.intervalSql}",
      "decision" ->
        (s"CASE WHEN ${conf.predLoadSql} >= ((c0 + c1*${cur}e0 + c2/${cur}e0 + " +
          s"c3/${cur * cur}e0) * ${conf.intervalSql}) THEN 'min_opt' " +
          s"WHEN ${conf.avgLatSql} > ${conf.maxLatSql} THEN 'scale_up_one' " +
          "ELSE 'min_opt' END"))
    Seq(dets, cns, feasSse, bestSse, bestS, cs, decide)
  }

  /** MST(x) over the grid column `xd` (double scale-out). */
  private val mstSql = "c0 + c1*xd + c2/xd + c3/(xd*xd)"

  // ---------------------------------------------------------------- fit --

  /** One-row coefficient frame (c0..c3, decision, …): the moments
    * aggregation with the Cramer chain applied level by level. */
  def fitCoeffs(train: DataFrame, conf: Conf = Conf()): DataFrame = {
    var one = fitMoments(train, conf)
    chainLevels(conf).foreach { lvl =>
      one = one.selectExpr("*" +: lvl.map { case (n, e) => s"($e) AS $n" }: _*)
    }
    one
  }

  /** Fit + score + decide, end to end. Output: one row per scale-out in
    * [minSo, maxSo] with mst, mstw, min-opt flag, decision, new scale-out.
    */
  def fitDecide(train: DataFrame, conf: Conf = Conf()): DataFrame = {
    val spark = train.sparkSession
    val cRow = broadcast(fitCoeffs(train, conf).select("c0", "c1", "c2", "c3", "decision"))
    // the grid is ≤ 23 rows by contract — the `% 1` keys below mark the
    // deliberately-bounded single-partition windows (not accidental ones)
    val wPrev = Window.partitionBy(col("scaleout") % 1).orderBy(col("scaleout"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("scaleout") % 1)
    spark.range(conf.minSo, conf.maxSo + 1).toDF("scaleout")
      .crossJoin(cRow)
      .withColumn("xd", col("scaleout").cast("double"))
      .withColumn("mst", expr(mstSql))
      .withColumn("mstw", expr(s"mst * ${conf.intervalSql}"))
      .withColumn("meets", expr(s"mstw > ${conf.predLoadSql}"))
      .withColumn("first_meets",
        col("meets") && count(when(col("meets"), 1)).over(wPrev) === 0)
      .withColumn("any_meets", max(when(col("meets"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("slack_rank", row_number().over(
        Window.partitionBy(col("scaleout") % 1)
          .orderBy(expr(s"mstw - ${conf.predLoadSql}").desc, col("scaleout"))))
      .withColumn("is_min_opt",
        when(col("any_meets"), col("first_meets")).otherwise(col("slack_rank") === 1))
      .withColumn("new_scale_out",
        when(col("decision") === "scale_up_one", lit(conf.currentSo + 1).cast("long"))
          .otherwise(max(when(col("is_min_opt"), col("scaleout"))).over(wAll)))
      .select(col("scaleout"), round(col("mst") + lit(1e-9), 4).as("mst"),
        round(col("mstw") + lit(1e-9), 4).as("mstw"), col("is_min_opt"),
        col("decision"), col("new_scale_out"))
  }

  // -------------------------------------------------------------- oracle --

  /** Full DuckDB oracle: identical moments, the identical expression chain
    * (one MATERIALIZED single-row CTE per level — DuckDB would otherwise
    * re-inline the computed columns exponentially), identical scoring. */
  def oracleSql(trainSql: String, conf: Conf = Conf()): String = {
    val levels = chainLevels(conf)
    val chain = levels.zipWithIndex.map { case (lvl, k) =>
      val prev = if (k == 0) "mom" else s"n${k - 1}"
      val sel = lvl.map { case (n, e) => s"($e) AS $n" }.mkString(",\n    ")
      s"n$k AS MATERIALIZED (SELECT *,\n    $sel\n  FROM $prev)"
    }.mkString(",\n")
    val cfin = s"n${levels.size - 1}"
    s"""WITH ${momentsCtes(trainSql, conf)},
       |$chain,
       |grid AS (SELECT r.scaleout, c0, c1, c2, c3, decision
       |  FROM range(${conf.minSo}, ${conf.maxSo + 1}) r(scaleout) CROSS JOIN $cfin),
       |g1 AS (SELECT *, CAST(scaleout AS DOUBLE) AS xd FROM grid),
       |g2 AS (SELECT *, ($mstSql) AS mst FROM g1),
       |g3 AS (SELECT *, mst * ${conf.intervalSql} AS mstw FROM g2),
       |g4 AS (SELECT *, mstw > ${conf.predLoadSql} AS meets FROM g3),
       |g5 AS (SELECT *,
       |    meets AND COUNT(CASE WHEN meets THEN 1 END) OVER (ORDER BY scaleout
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) = 0 AS first_meets,
       |    MAX(CASE WHEN meets THEN 1 ELSE 0 END) OVER () = 1 AS any_meets,
       |    row_number() OVER (ORDER BY (mstw - ${conf.predLoadSql}) DESC, scaleout)
       |      AS slack_rank
       |  FROM g4),
       |g6 AS (SELECT *,
       |    CASE WHEN any_meets THEN first_meets ELSE slack_rank = 1 END AS is_min_opt
       |  FROM g5)
       |SELECT scaleout, ROUND(mst + 1e-9, 4) AS mst, ROUND(mstw + 1e-9, 4) AS mstw,
       |  is_min_opt, decision,
       |  CASE WHEN decision = 'scale_up_one' THEN CAST(${conf.currentSo + 1} AS BIGINT)
       |    ELSE (SELECT MAX(CASE WHEN is_min_opt THEN scaleout END) FROM g6)
       |  END AS new_scale_out
       |FROM g6""".stripMargin
  }
}
