package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: the 16 permutation minima
  * min_h (h·(2j+1) + 7919j) mod p over an array of base shingle hashes
  * — value-identical to [[graft.pipeline.DedupOps.minhashSig]] (the
  * array-lambda form) and to the explode/groupBy relational form
  * (pinned by DedupEquivalenceSpec).
  *
  * Exists for the same reason as [[VecDot]]: the lambda form walks an
  * interpreted expression tree per (shingle × permutation), and the
  * relational form — adopted when the lambda measured 15× slower —
  * buys codegen at the price of exploding 16 rows per shingle through
  * a full shuffle (4M rows at sf0.1) plus two aggregations. This
  * kernel computes all 16 minima in ONE JIT-compiled pass over the
  * hash array, per document row, map-side; banding then needs only
  * the per-document shingle collection. Min is order-independent, so
  * a nondeterministically-ordered collect_list feeds it safely. */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<bigint> argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  val K = 16
  val MOD = 1000000007L

  /** All K affine-permutation minima in one pass; null for an empty
    * array (the lambda form's array_min(empty) = null, though the
    * shingle contract — every document yields at least one partial
    * shingle — makes this unreachable in the pipelines). */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val h = hs.toLongArray()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = h(i)
      var j = 0
      while (j < K) {
        val p = (v * (2 * j + 1) + j * 7919L) % MOD
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
