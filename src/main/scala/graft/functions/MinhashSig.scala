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

  // containsNull: an empty input yields 16 null minima (matching the
  // DSL chain, whose array_min over no elements is null) — non-empty
  // inputs never produce null elements
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
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

  /** All K affine-permutation minima in one pass. An EMPTY array yields
    * K null elements — exactly the lambda chain's array_min(empty) =
    * null — never a null RESULT: nullSafeEval/defineCodeGen assume the
    * value is non-null whenever the child is, so returning Java null
    * here would escape with isNull = false and NPE downstream (found
    * by review on the public SQL surface; the internal shingle contract
    * guarantees at least one partial shingle). */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](K)(null))
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
