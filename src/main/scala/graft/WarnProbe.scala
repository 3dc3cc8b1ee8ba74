package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only probe. */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$name: ${(System.nanoTime()-t0)/1e9}s"); r
    }
    import graft.pipeline.DedupOps._
    val sets = time("sets")(shingleSets(docs))
    time("sets-noop")(sets.write.format("noop").mode("overwrite").save())
    val hs = sets.withColumn("hs", shingleHashes(col("sh")))
    time("hashes-noop")(hs.write.format("noop").mode("overwrite").save())
    val sigs = hs.withColumn("sig", minhashSig(col("hs")))
    time("sigs-noop")(sigs.select("doc_id","sig").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
