package graft.queries

import graft.Tables
import graft.pipeline.SketchOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic-structure queries: Bloom-filter semi-join pruning and
  * HyperLogLog distinct counting, each with its exact-membership /
  * exact-count honesty diagnostic and a bit-exact DuckDB oracle (all
  * hashes md5-derived, all registers integer — see
  * [[graft.pipeline.SketchOps]]).
  */
object SketchQueries extends QueryModule {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private def hex60Sql(h: String) = s"CAST('0x' || substr($h, 1, 15) AS BIGINT)"

  private val BloomK = 3
  private val BloomM = 4096
  private val HllP = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom prune of the full corpus against the 'de'-language id set:
    // per doc, the filter's verdict next to ground truth (no false
    // negatives by construction; false positives are the visible tail)
    "bloom_prune" -> ((s, d) => {
      val all = docs(s, d)
      SketchOps.bloomPrune(all, all.filter(col("lang") === "de"), "doc_id",
        k = BloomK, m = BloomM)
    }),

    // HLL per-source distinct-token estimate next to the exact count
    "corpus_hll_distinct" -> ((s, d) =>
      SketchOps.hllDistinct(docs(s, d), p = HllP)),

    // windowed distinct-user HLL over the event stream: per hour bucket,
    // estimate + exact honesty — the mergeable per-time-bucket sketch a
    // metrics store keeps (daily = max-merge of the hours)
    "events_hll_windows" -> ((s, d) =>
      SketchOps.hllUserWindows(Tables.events(s, d), p = HllP)))

  def oracles: Map[String, String] = Map(
    "events_hll_windows" -> {
      val m = 1 << HllP
      val alpha = 0.7213 / (1 + 1.079 / m)
      val num = alpha * m * m * math.pow(2.0, 53)
      s"""WITH du AS (SELECT DISTINCT
         |    (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_start,
         |    user_id
         |  FROM events),
         |h AS (SELECT win_start,
         |    ${hex60Sql("md5('hllu:' || CAST(user_id AS VARCHAR))")} AS h FROM du),
         |rr AS (SELECT win_start, (h // ${1L << 52}) % $m AS r,
         |         h % ${1L << 52} AS w FROM h),
         |rho AS (SELECT win_start, r,
         |          CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
         |        FROM rr),
         |regs AS (SELECT win_start, r, MAX(rho) AS mr FROM rho GROUP BY 1, 2),
         |agg AS (SELECT win_start,
         |          SUM(CAST(1 AS BIGINT) << CAST(53 - mr AS INT)) AS sp,
         |          COUNT(*) AS present
         |        FROM regs GROUP BY win_start),
         |est AS (SELECT win_start,
         |          CAST('${num.toString}' AS DOUBLE)
         |            / CAST(sp + ($m - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS raw,
         |          $m - present AS zeros
         |        FROM agg),
         |fin AS (SELECT win_start,
         |          CASE WHEN raw <= ${2.5 * m} AND zeros > 0
         |               THEN ${m.toDouble} * ln(${m.toDouble} / CAST(zeros AS DOUBLE))
         |               ELSE raw END AS e
         |        FROM est),
         |ex AS (SELECT win_start, COUNT(*) AS exact_n FROM du GROUP BY win_start)
         |SELECT ex.win_start, ex.exact_n,
         |  CAST(ROUND(f.e + 1e-9, 0) AS BIGINT) AS hll_n,
         |  ROUND((ROUND(f.e + 1e-9, 0) - CAST(ex.exact_n AS DOUBLE))
         |    / CAST(ex.exact_n AS DOUBLE) + 1e-9, 4) AS rel_err
         |FROM fin f JOIN ex ON f.win_start = ex.win_start""".stripMargin
    },

    "bloom_prune" -> {
      def pos(id: String) =
        s"${hex60Sql(s"md5('bl' || CAST(i AS VARCHAR) || ':' || CAST($id AS VARCHAR))")} % $BloomM"
      s"""WITH keys AS (SELECT DISTINCT doc_id FROM documents WHERE lang = 'de'),
         |idx AS (SELECT unnest(range(0, $BloomK)) AS i),
         |bits AS (SELECT DISTINCT ${pos("doc_id")} AS p
         |         FROM keys CROSS JOIN idx),
         |pp AS (SELECT d.doc_id, ${pos("d.doc_id")} AS p
         |       FROM documents d CROSS JOIN idx),
         |bm AS (SELECT doc_id,
         |         MIN(CASE WHEN b.p IS NULL THEN 0 ELSE 1 END) AS bloom_member
         |       FROM pp LEFT JOIN bits b ON pp.p = b.p GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN k.doc_id IS NULL THEN 0 ELSE 1 END AS exact_member,
         |  bm.bloom_member
         |FROM documents d
         |LEFT JOIN keys k ON d.doc_id = k.doc_id
         |JOIN bm ON d.doc_id = bm.doc_id""".stripMargin
    },

    "corpus_hll_distinct" -> {
      val m = 1 << HllP
      val alpha = 0.7213 / (1 + 1.079 / m)
      val num = alpha * m * m * math.pow(2.0, 53)
      s"""WITH tok AS (SELECT DISTINCT source, t FROM (
         |    SELECT source, unnest(list_distinct(string_split(text, ' '))) AS t
         |    FROM documents)),
         |h AS (SELECT source, ${hex60Sql("md5('hll:' || t)")} AS h FROM tok),
         |rr AS (SELECT source, (h // ${1L << 52}) % $m AS r,
         |         h % ${1L << 52} AS w FROM h),
         |rho AS (SELECT source, r,
         |          CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
         |        FROM rr),
         |regs AS (SELECT source, r, MAX(rho) AS mr FROM rho GROUP BY 1, 2),
         |agg AS (SELECT source,
         |          SUM(CAST(1 AS BIGINT) << CAST(53 - mr AS INT)) AS sp,
         |          COUNT(*) AS present
         |        FROM regs GROUP BY source),
         |est AS (SELECT source,
         |          CAST('${num.toString}' AS DOUBLE)
         |            / CAST(sp + ($m - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS raw,
         |          $m - present AS zeros
         |        FROM agg),
         |fin AS (SELECT source,
         |          CASE WHEN raw <= ${2.5 * m} AND zeros > 0
         |               THEN ${m.toDouble} * ln(${m.toDouble} / CAST(zeros AS DOUBLE))
         |               ELSE raw END AS e
         |        FROM est),
         |ex AS (SELECT source, COUNT(*) AS exact_n FROM tok GROUP BY source)
         |SELECT ex.source, ex.exact_n,
         |  CAST(ROUND(f.e + 1e-9, 0) AS BIGINT) AS hll_n,
         |  ROUND((ROUND(f.e + 1e-9, 0) - CAST(ex.exact_n AS DOUBLE))
         |    / CAST(ex.exact_n AS DOUBLE) + 1e-9, 4) AS rel_err
         |FROM fin f JOIN ex ON f.source = ex.source""".stripMargin
    })
}
