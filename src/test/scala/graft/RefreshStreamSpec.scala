package graft

import graft.pipeline.VectorOps
import graft.streaming.StreamingJobs
import org.apache.spark.sql.functions._

/** The streaming incremental-refresh twin: gates, band-state near-dup
  * probe, frozen-centroid assignment — and the one behavior the
  * append-only twins can't express: DELETION evicts a doc from its
  * bands' member sets, so a later arrival matches the survivors, not
  * ghosts.
  */
class RefreshStreamSpec extends SparkSpec {
  import spark.implicits._

  // gate-passing text: 24 words, 2 distinct en stopwords, mean word
  // length inside [4,5], all distinct
  private val textA =
    ("the" +: "of" +: (0 until 22).map(i => f"w$i%02dxy")).mkString(" ")
  // policy-failing text: 4 whole-word banned hits (> PolicyMaxHits = 3)
  private val textBad =
    ("slow slow slow slow " +
      (0 until 20).map(i => f"v$i%02dxy").mkString(" "))

  private val e1 = Seq(1f, 0f, 0f, 0f)

  test("fates: indexed / near_dup / gated / evicted, and match-after-eviction") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val embFit = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(1f, 0.1f, 0f, 0f)), (3L, Seq(0f, 0.9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = VectorOps.kmeansCentroids(embFit, targetCellSize = 2)
    val expCid = VectorOps.kmeansRanked(
        Seq((1L, e1)).toDF("vec_id", "embedding"), cents, maxRank = 1)
      .select(col("cid").cast("long")).head.getLong(0)

    val in = MemoryStream[(Long, String, String, Seq[Float])]
    val q = StreamingJobs.refreshStream(in.toDS(), cents)
      .writeStream.format("memory").queryName("refresh_stream")
      .outputMode("append").start()
    def fates() = spark.table("refresh_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    try {
      // batch 1: fresh doc, its near-dup, and a policy-gated doc
      in.addData(Seq((1L, "upsert", textA, e1), (2L, "upsert", textA, e1),
        (9L, "upsert", textBad, e1)))
      q.processAllAvailable()
      assert(fates() === Set(
        (1L, "upsert", "indexed", None, Some(expCid)),
        (2L, "upsert", "near_dup", Some(1L), None),
        (9L, "upsert", "gated", None, None)))
      // batch 2: CDC delete (full before-image) evicts doc 1
      in.addData(Seq((1L, "delete", textA, e1)))
      q.processAllAvailable()
      assert(fates().contains((1L, "delete", "evicted", None, None)))
      // batch 3: a new arrival of the same content matches the SURVIVING
      // member (2), not the evicted ghost (1)
      in.addData(Seq((3L, "upsert", textA, e1)))
      q.processAllAvailable()
      assert(fates().contains((3L, "upsert", "near_dup", Some(2L), None)))
      // state sanity: band store holds only the touched band keys
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // 4 bands for textA + nothing for the gated doc (never routed),
      // + 4 (doc,op) rows in the stateless fate stage's store
      assert(stateRows <= 16L, s"state must stay band/doc-bounded, got $stateRows")
    } finally q.stop()
  }

  test("re-upsert re-emits a fate but never duplicates membership") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cents = VectorOps.kmeansCentroids(
      Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"), targetCellSize = 1)
    val in = MemoryStream[(Long, String, String, Seq[Float])]
    val q = StreamingJobs.refreshStream(in.toDS(), cents)
      .writeStream.format("memory").queryName("refresh_stream2")
      .outputMode("append").start()
    try {
      in.addData(Seq((5L, "upsert", textA, e1)))
      q.processAllAvailable()
      in.addData(Seq((5L, "upsert", textA, e1)))
      q.processAllAvailable()
      val got = spark.table("refresh_stream2").collect()
        .map(r => (r.getLong(0), r.getString(2))).toList
      // two fates emitted (it IS an update feed), both indexed — the
      // second probe sees only itself in every band (no self-match)
      assert(got.count(_ == ((5L, "indexed"))) === 2, s"got $got")
      in.addData(Seq((6L, "upsert", textA, e1)))
      q.processAllAvailable()
      val six = spark.table("refresh_stream2").collect()
        .map(r => (r.getLong(0), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      assert(six.contains((6L, "near_dup", Some(5L))))
    } finally q.stop()
  }
}
