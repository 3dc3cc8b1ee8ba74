package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native centroid ranking for the k-means IVF quantizer: for a
  * quantized vector `q`, the `maxRank` nearest centroids of `cents` as
  * an array of (d, c) structs ordered by (squared distance asc, cid
  * asc) — exactly the `slice(array_sort(transform(centsLit, …)), 1,
  * maxRank)` Column-DSL form in
  * [[graft.pipeline.VectorOps.kmeansRankedDsl]] (pinned bit-equal by
  * NativeVecSpec).
  *
  * Exists because the DSL form rides TWO interpreted cliffs at once:
  * the per-centroid lambda is an interpreted expression walk, and —
  * worse — Catalyst's project collapse inlines the single-referenced
  * quantization `transform(embedding, …)` INTO that lambda, where the
  * higher-order evaluator re-runs it once per centroid (k× per row;
  * profiled 3.7 s vs 0.1 s for the explode stage at sf0.1, k = 40).
  * As a regular unary expression the quantized child is evaluated once
  * per row by ordinary projection code, and the k×dim distance loop +
  * bounded selection run as one JIT-compiled call.
  *
  * The centroid matrix is a constructor parameter (driver-fit
  * constant, plan-embedded like a broadcast literal), not a child
  * expression — it is identical for every row by construction.
  */
case class KmeansRank(child: Expression, cents: Array[Array[Long]], maxRank: Int)
    extends UnaryExpression {

  // Array params compare by reference under case-class equality, which
  // would make two value-identical instances unequal during plan
  // canonicalization (blocking exchange/subplan reuse, never wrong
  // results) — compare the matrix by content instead.
  override def equals(other: Any): Boolean = other match {
    case KmeansRank(c, ce, m) =>
      c == child && m == maxRank && java.util.Arrays.deepEquals(
        ce.asInstanceOf[Array[AnyRef]], cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.deepHashCode(
      cents.asInstanceOf[Array[AnyRef]])) + maxRank

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_kmeans_rank requires an array<bigint> argument, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", LongType, nullable = false),
      StructField("c", IntegerType, nullable = false))), containsNull = false)

  override def prettyName: String = "vec_kmeans_rank"

  override def nullSafeEval(input: Any): Any =
    KmeansRank.compute(input.asInstanceOf[ArrayData], cents, maxRank)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KmeansRank.compute($c, $centsRef, $maxRank)")
  }

  override protected def withNewChildInternal(newChild: Expression): KmeansRank =
    copy(child = newChild)
}

object KmeansRank {
  /** Squared distance from `q` to every centroid, then the `maxRank`
    * smallest by (distance, cid) — a bounded selection sort over the
    * distance array (maxRank ≤ 16 in practice, so O(k·maxRank) beats
    * sorting all k). Ties break to the lowest cid, matching the struct
    * ordering of the DSL form. */
  def compute(q: ArrayData, cents: Array[Array[Long]], maxRank: Int): ArrayData = {
    val x = q.toLongArray()
    val k = cents.length
    val d = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      if (cv.length != x.length)
        throw new IllegalArgumentException(
          s"vec_kmeans_rank: vector dim ${x.length} != centroid dim ${cv.length}")
      var s = 0L
      var i = 0
      while (i < x.length) { val t = x(i) - cv(i); s += t * t; i += 1 }
      d(c) = s
      c += 1
    }
    val m = math.min(maxRank, k)
    val out = new Array[Any](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestD = Long.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && (best == -1 || d(j) < bestD)) { bestD = d(j); best = j }
        j += 1
      }
      taken(best) = true
      out(r) = InternalRow(bestD, best)
      r += 1
    }
    new GenericArrayData(out)
  }
}
