package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.functions._

/** Pins the native vector kernels ([[graft.functions.VecDot]],
  * [[graft.functions.VecSqDist]], [[graft.functions.KmeansRank]])
  * bit-equal to their portable Column-DSL twins on real corpus data —
  * the same contract ShingleMinHash carries: the native form is a
  * performance vehicle, never a semantics fork.
  */
class NativeVecSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("vec_dot == aggregate(zip_with(*)) on every corpus pair sample") {
    val e = emb.select(col("vec_id"), VectorOps.quant.as("q"))
    // adjacent-id pairs: cheap deterministic sample with full coverage
    val pairs = e.select(col("vec_id"), col("q"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("q").as("q2")), Seq("vec_id"))
    val diff = pairs.select(
      (VectorOps.dot(col("q"), col("q2")) =!=
        VectorOps.dotDsl(col("q"), col("q2"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff === 0L)
  }

  test("vec_sqdist == DSL fold on every corpus pair sample") {
    val e = emb.select(col("vec_id"), VectorOps.quant.as("q"))
    val pairs = e.select(col("vec_id"), col("q"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("q").as("q2")), Seq("vec_id"))
    val diff = pairs.select(
      (VectorOps.sqdist(col("q"), col("q2")) =!=
        VectorOps.sqdistDsl(col("q"), col("q2"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff === 0L)
  }

  test("native KmeansRank == DSL ranked frame (full frame, both probe depths)") {
    val cents = VectorOps.kmeansCentroids(emb)
    for (maxRank <- Seq(1, VectorOps.defaultNprobe(cents.length))) {
      val native = VectorOps.kmeansRanked(emb, cents, maxRank)
      val dsl = VectorOps.kmeansRankedDsl(emb, cents, maxRank)
      // nullability may tighten (the native kernel never returns null
      // elements); names and types must match exactly
      assert(native.schema.map(f => (f.name, f.dataType)) ===
        dsl.schema.map(f => (f.name, f.dataType)),
        s"schema mismatch at maxRank=$maxRank: ${native.schema} vs ${dsl.schema}")
      assert(native.exceptAll(dsl).isEmpty && dsl.exceptAll(native).isEmpty,
        s"ranked frames differ at maxRank=$maxRank")
    }
  }

  test("vec_dot is reachable as a SQL function via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head.getLong(0)
    assert(r === 32L)
    val s = spark.sql(
      "SELECT vec_sqdist(array(1L, 2L), array(4L, 6L)) AS d").head.getLong(0)
    assert(s === 25L)
  }
}
