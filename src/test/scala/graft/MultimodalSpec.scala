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

  test("sceneCuts: hand-built frame deltas are exact; only video records scored") {
    import graft.pipeline.MMRecord
    // 3-frame, 4-byte synthetic video: frame deltas are hand-computable
    val p = Array[Byte](
      0, 10, 20, 30,           // frame 0
      0, 10, 20, 30,           // frame 1: identical -> delta 0
      100, 10, 0, -126)        // frame 2: |100-0|+0+20+|130-30| = 220
    val recs = Seq(
      MMRecord(1L, "video", p, 4, 1, 3, 4),
      MMRecord(2L, "image", p, 4, 1, 3, 4)).toDS()
    val got = MultimodalOps.sceneCuts(recs, threshold = 100L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).sorted
    // image record never scored; identical pair delta 0 (no cut);
    // -126.toByte reads as unsigned 130
    assert(got.toSeq == Seq((1L, 1, 0L, false), (1L, 2, 220L, true)))
  }

  test("resize halves geometry to the bound and truncates the byte budget") {
    val mm = MultimodalOps.asRecords(MultimodalOps.mmTable(docs))
    val out = MultimodalOps.resize(mm, maxDim = 16).collect()
    assert(out.forall(r => r.getInt(1) <= 16 && r.getInt(2) <= 16))
    assert(out.forall(r => r.getLong(3) <= 128L))
  }

  test("frameDedup: twins lose exactly their 3 unflipped frames; originals keep all") {
    val withTwins = MultimodalOps.asRecords(MultimodalOps.mmTableWithTwins(docs))
    val out = MultimodalOps.frameDedup(withTwins).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val planted = docs.select(col("doc_id")).filter(col("doc_id") % 50 === 0)
      .collect().map(_.getLong(0))
    // every record reports all 4 frames; originals (lower doc_id) own
    // the first occurrence, so they have zero dups
    assert(out.values.forall(_._1 == 4L))
    assert(planted.forall(id => out(id)._2 == 0L))
    // a twin's flipped byte sits in frame 0 or 1 (pos <= 60 < 64), so
    // exactly 3 of its frames duplicate the original's
    assert(planted.forall(id => out(id + 1000000000L)._2 == 3L))
    assert(out.filterNot { case (id, _) => planted.contains(id - 1000000000L) }
      .forall(_._2._2 == 0L))
  }

  test("silenceSpans: spans are maximal runs of sub-threshold windows") {
    val mm = MultimodalOps.asRecords(MultimodalOps.mmTable(docs))
    val thr = 100000L
    val spans = MultimodalOps.silenceSpans(mm, windowBytes = 24, threshold = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val energy = MultimodalOps.energyCurve(mm, windowBytes = 24).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(spans.nonEmpty)
    spans.foreach { case (doc, start, n, bytes) =>
      // every window inside the span is silent; the windows bracketing
      // it (if they exist) are not — maximality
      (start until start + n).foreach(w => assert(energy((doc, w)) < thr))
      energy.get((doc, start - 1)).foreach(ss => assert(ss >= thr))
      energy.get((doc, start + n)).foreach(ss => assert(ss >= thr))
      assert(bytes <= n * 24)
    }
    // total silent windows across spans == total sub-threshold windows
    assert(spans.map(_._3).sum == energy.values.count(_ < thr))
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

  test("phashClusters: every twin shares a cluster with its original, labels are min-member") {
    val withTwins = MultimodalOps.asRecords(MultimodalOps.mmTableWithTwins(docs))
    val clusters = MultimodalOps.phashClusters(withTwins).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = docs.select(col("doc_id")).filter(col("doc_id") % 50 === 0)
      .collect().map(_.getLong(0)).toSet
    // every record is labeled
    assert(clusters.size == withTwins.count())
    planted.foreach { id =>
      assert(clusters(id) == clusters(id + 1000000000L),
        s"twin of $id landed in a different cluster") }
    // the label is the cluster's minimum member id
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min) }
  }

  test("audioFingerprint: audio-only, deterministic, matches a driver-side replay") {
    // wide id range so all three kinds appear; audio = doc_id % 3 == 1
    val wide = (0L to 60L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val recs = MultimodalOps.asRecords(MultimodalOps.mmTable(wide))
    val got = MultimodalOps.audioFingerprint(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 60L).filter(_ % 3 == 1).toSet)
    // replay bit rule on the raw payload bytes
    val payloads = recs.collect().map(r => r.doc_id -> r.payload).toMap
    got.foreach { case (id, fp) =>
      val wins = payloads(id).grouped(MultimodalOps.AUDIO_FP_WIN)
        .map(_.map { b => val c = (b & 0xff) - 128L; c * c }.sum).toArray
      var h = 0L
      (0 until math.min(60, wins.length - 1)).foreach { i =>
        if (wins(i + 1) > wins(i)) h |= (1L << i)
      }
      assert(h == fp, s"fingerprint of $id")
    }
  }

  test("audioFpDups recovers every planted AUDIO twin within hamming 2") {
    // ids 0..299 → audio originals with twins at doc_id ≡ 100 (mod 150)
    val wide = (0L until 300L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val withTwins = MultimodalOps.asRecords(MultimodalOps.mmTableWithTwins(wide))
    val pairs = MultimodalOps.audioFpDups(withTwins).collect()
    val planted = (0L until 300L)
      .filter(id => id % 50 == 0 && id % 3 == 1).toSet
    assert(planted.nonEmpty)
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.forall(id => found.contains((id, id + 1000000000L))),
      s"missing audio twins: ${
        planted.filterNot(id => found.contains((id, id + 1000000000L)))}")
    // a one-byte tweak moves one energy window = <= 2 adjacent delta bits
    assert(pairs.filter(r => planted.contains(r.getLong(0)) &&
      r.getLong(1) == r.getLong(0) + 1000000000L).forall(_.getLong(2) <= 2))
    assert(pairs.forall(_.getLong(2) <= 5))
  }

  test("degenerate constant signatures stay LINEAR: star pairs, never all-pairs") {
    import graft.pipeline.MMRecord
    // 200 byte-identical silent clips — every afp60 is 0 (all energy
    // windows equal), the degenerate family a real audio corpus is full
    // of. All-pairs would emit 200·199/2 = 19,900 rows and send one band
    // bucket quadratic; the representative contract emits exactly m − 1
    // star pairs to the min-id rep, and the banded join sees ONE row.
    val silent = Array.fill[Byte](128)(0)
    val m = 200
    val recs = (0L until m.toLong)
      .map(i => MMRecord(i, "audio", silent, 4, 1, 4, 32)).toDS()
    val got = MultimodalOps.audioFpDups(recs).collect()
    assert(got.length == m - 1)
    assert(got.forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L))
    assert(got.map(_.getLong(1)).toSet == (1L until m.toLong).toSet)
  }
}
