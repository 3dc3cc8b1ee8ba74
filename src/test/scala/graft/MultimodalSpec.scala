package graft

import graft.pipeline.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload shape, typed iterator processing,
  * determinism. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq((0L, "x"), (1L, "y"), (5L, "z")).toDF("doc_id", "text")

  test("payloads are genuine binary of frames*frame_size bytes") {
    val recs = MultimodalOps.asRecords(MultimodalOps.mmTable(docs)).collect()
    assert(recs.forall(_.payload.length ==
      MultimodalOps.FRAMES * MultimodalOps.FRAME_SIZE))
    // deterministic synthesis
    val again = MultimodalOps.asRecords(MultimodalOps.mmTable(docs)).collect()
    assert(recs.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.payload.sameElements(b.payload) })
    // payload of doc 0 starts with md5("0:0") bytes
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("0:0".getBytes("UTF-8"))
    assert(recs.find(_.doc_id == 0L).get.payload.take(16).sameElements(h))
  }

  test("frame sampling slices frames by stride; histogram covers all bytes") {
    val mm = MultimodalOps.asRecords(MultimodalOps.mmTable(docs))
    val sampled = MultimodalOps.frameSample(mm, stride = 2)
    assert(sampled.count() == 3 * 2) // frames 0 and 2 of 4
    assert(sampled.select(min(col("n_bytes")), max(col("n_bytes")))
      .head.toSeq == Seq(32L, 32L))
    val hist = MultimodalOps.byteHistogram(mm)
    // 16 buckets per doc, counts sum to payload length
    assert(hist.groupBy("doc_id").agg(count(lit(1)), sum("n")).collect()
      .forall(r => r.getLong(1) == 16 && r.getLong(2) == 128L))
  }

  test("resize halves geometry to the bound and truncates the byte budget") {
    val mm = MultimodalOps.asRecords(MultimodalOps.mmTable(docs))
    val out = MultimodalOps.resize(mm, maxDim = 16).collect()
    assert(out.forall(r => r.getInt(1) <= 16 && r.getInt(2) <= 16))
    assert(out.forall(r => r.getLong(3) <= 128L))
  }

  test("phashDups recovers every planted twin within hamming 2 of its original") {
    val withTwins = MultimodalOps.asRecords(MultimodalOps.mmTableWithTwins(docs))
    val pairs = MultimodalOps.phashDups(withTwins).collect()
    val planted = docs.select(col("doc_id")).filter(col("doc_id") % 50 === 0)
      .collect().map(_.getLong(0)).toSet
    // pigeonhole completeness: a one-byte flip moves <= 2 dHash bits, so
    // banding must surface EVERY planted (orig, twin) pair
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.forall(id => found.contains((id, id + 1000000000L))),
      s"missing twins: ${planted.filterNot(id => found.contains((id, id + 1000000000L)))}")
    assert(pairs.forall(_.getLong(2) <= 5))
    assert(pairs.filter(r => planted.contains(r.getLong(0)) &&
      r.getLong(1) == r.getLong(0) + 1000000000L).forall(_.getLong(2) <= 2))
  }
}
