package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: runs every query at a given SF, reporting per-query
  * global-window warnings and timings (plan-audit helper). */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
        System.err.println(s"===QUERY $name")
        val df = fn(spark, sf)
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
        df.write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
