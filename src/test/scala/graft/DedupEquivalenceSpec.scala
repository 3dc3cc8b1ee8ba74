package graft

import graft.pipeline.{DedupOps, VectorOps}
import org.apache.spark.sql.functions._

/** The relational (explode/groupBy) formulations used in the hot query
  * paths must produce EXACTLY the same values as the direct array-lambda
  * formulations they replaced — these tests pin that equivalence, so the
  * perf rewrites can never drift semantically. */
class DedupEquivalenceSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g"),
    (2L, "a b c d e f g h i"),
    (3L, "x y z a b c"),
    (4L, "q w e r t y u i o p"),
    // sub-shingle-width documents: the out-of-range tail must yield a
    // partial shingle, not an ANSI element_at error
    (5L, "solo"),
    (6L, "two tokens")).toDF("doc_id", "text")

  test("relational MinHash band keys equal the lambda formulation") {
    val viaLambda = DedupOps.shingleSets(docs)
      .withColumn("sig", DedupOps.minhashSig(DedupOps.shingleHashes(col("sh"))))
      .select(col("doc_id"), explode(DedupOps.bandKeys(col("sig"))).as("bkey"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaRelational = DedupOps.minhashBandsRelational(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaLambda == viaRelational)
  }

  test("min-column banding equals the exploded relational formulation") {
    val inv = DedupOps.shingleRows(docs)
    val viaMinCols = DedupOps.minhashBandsFromInv(inv)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaExploded = DedupOps.minhashBandsExploded(inv)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaMinCols == viaExploded)
  }

  test("native MinhashSig kernel (the streaming path) equals the DSL signature") {
    import org.apache.spark.sql.GraftColumnBridge.{column => ncol, expression => nexpr}
    val hs = DedupOps.shingleHashes(DedupOps.shingles(split(col("text"), " ")))
    val diff = docs.select(
      (ncol(graft.functions.MinhashSig(nexpr(hs))) =!=
        DedupOps.minhashSig(hs)).as("ne"))
      .filter(col("ne")).count()
    assert(diff === 0L)
  }

  test("relational shingle rows equal the lambda shingle sets") {
    val viaLambda = DedupOps.shingleSets(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaRelational = DedupOps.shingleRows(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaLambda == viaRelational)
  }

  test("relational hyperplane sign bands equal the lambda formulation") {
    val emb = (0L until 6L).map { id =>
      (id, (0 until 64).map(i => ((id * 31 + i * 7) % 13).toFloat / 13f - 0.5f).toArray)
    }.toDF("vec_id", "embedding")
    val planes = VectorOps.hyperplanes()
    val viaLambda = emb.select(col("vec_id"), VectorOps.quant.as("q"))
      .withColumn("sig", VectorOps.signBits(col("q"), planes))
      .select(col("vec_id"), explode(VectorOps.signBandKeys(col("sig"))).as("bkey"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaRelational = VectorOps.signBandsRelational(emb)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaLambda == viaRelational)
  }

  test("cosinePre equals cosine bit-for-bit") {
    val emb = (0L until 5L).map { id =>
      (id, (0 until 8).map(i => ((id * 17 + i * 3) % 11).toFloat / 11f - 0.4f).toArray)
    }.toDF("vec_id", "embedding")
    val e = emb.select(col("vec_id"), VectorOps.quant.as("q"))
      .withColumn("n2", VectorOps.dot(col("q"), col("q")))
    val pairs = e.select(col("vec_id").as("ida"), col("q").as("qa"), col("n2").as("n2a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("q").as("qb"), col("n2").as("n2b")))
      .filter(col("ida") < col("idb"))
    val both = pairs.select(
      VectorOps.cosine(col("qa"), col("qb")).as("c1"),
      VectorOps.cosinePre(col("qa"), col("qb"), col("n2a"), col("n2b")).as("c2"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("probeDupHits over a snapshot-style split equals incrementalPairs") {
    // richer fixture: near-dup pairs that straddle an id split, so both
    // the band probe and the Jaccard verify produce non-empty results
    val snap = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight ten"),
      (12L, "totally unrelated content with fresh words only")
    ).toDF("doc_id", "text")
    val viaSplit = DedupOps.incrementalPairs(snap, splitId = 10L)
      .collect().map(_.toSeq).toSet
    val viaFrames = DedupOps.probeDupHits(
        snap.filter(col("doc_id") < 10L), snap.filter(col("doc_id") >= 10L))
      .collect().map(_.toSeq).toSet
    assert(viaSplit == viaFrames)
    assert(viaSplit.nonEmpty, "fixture should produce at least one near-dup hit")
  }
}
