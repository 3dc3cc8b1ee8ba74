package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: runs every query at a given SF, reporting per-query
  * global-window warnings and timings (plan-audit helper). Session
  * config mirrors [[Bench]]/[[Verify]] — in particular the
  * GraftExtensions registration, without which the native-expression
  * queries (shingle_min_hash) fail to resolve and the probe would die
  * mid-alphabet. A query that throws is RECORDED, not fatal: the probe
  * always audits the full surface, then exits non-zero listing the
  * failures. */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.toSet
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
        System.err.println(s"===QUERY $name")
        try {
          val df = fn(spark, sf)
          if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
          df.write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          failed += ((name, Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"===FAILED ${failed.size} queries:")
      failed.foreach { case (n, m) => System.err.println(s"  $n: ${m.linesIterator.take(1).mkString}") }
      sys.exit(1)
    }
  }
}
