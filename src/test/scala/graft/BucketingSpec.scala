package graft

import graft.sources.BucketedStore
import org.apache.spark.sql.functions._

/** Pins the scale contract of [[BucketedStore]]: a join of two tables
  * bucketed on the same key into the same bucket count plans WITHOUT any
  * shuffle exchange — the layout that makes fact-fact joins survivable
  * at 100 TB — and still returns exactly the plain join's rows. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val docs = (0L until 1000L).map(i => (i, s"text_$i")).toDF("doc_id", "text")
    val feats = (0L until 1000L).map(i => (i, i * 2.0)).toDF("doc_id", "score")
    BucketedStore.write(docs, "docs_b", s"$dir/docs", "doc_id", 8)
    BucketedStore.write(feats, "feats_b", s"$dir/feats", "doc_id", 8)
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.read(spark, "docs_b")
        .join(BucketedStore.read(spark, "feats_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // same rows as the plain (shuffling) join of the raw frames
      val got = joined.select("doc_id", "text", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
      val want = docs.join(feats, "doc_id")
        .select("doc_id", "text", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS feats_b")
    }
  }

  test("bucketed write round-trips values and keeps the bucket count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed_rt").toString
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("doc_id", "v")
    BucketedStore.write(df, "rt_b", s"$dir/rt", "doc_id", 4)
    try {
      val back = BucketedStore.read(spark, "rt_b")
      assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
        == (0L until 100L).map(i => (i, s"v$i")))
      val cat = spark.sql("DESCRIBE EXTENDED rt_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(cat.get("Num Buckets").contains("4"), s"catalog lost the bucket spec: $cat")
    } finally spark.sql("DROP TABLE IF EXISTS rt_b")
  }
}
