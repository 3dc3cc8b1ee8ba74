package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst kernels for quantized-vector arithmetic (the brief's
  * tier (b): codegen'd `Expression`s where the built-in functions can't
  * express the operator efficiently).
  *
  * The Column-DSL forms (`aggregate(zip_with(a, b, (x, y) => x * y),
  * 0L, _ + _)` in [[graft.pipeline.VectorOps]]) are higher-order
  * functions: Spark evaluates their lambdas INTERPRETED, one boxed
  * expression-tree walk per element — profiled at sf0.1 that interpreted
  * walk dominated every probed ANN search (the per-row k×dim centroid
  * ranking alone took 5.3 s for 5M long multiplies). These kernels run
  * the identical integer arithmetic as one tight JIT-compiled loop over
  * primitive arrays, both from interpreted eval (inside higher-order
  * lambdas) and from whole-stage codegen (a single static call emitted
  * into the generated method, like [[ShingleMinHash]]).
  *
  * Value-identical to the DSL forms on equal-length, non-null arrays
  * (pinned by a property test in `NativeVecSpec`); the quantized
  * embedding contract guarantees both. Registered as SQL functions
  * `vec_dot` / `vec_sqdist` by [[graft.GraftExtensions]]; the engine
  * reaches them directly through `ExpressionUtils.column`, so no session
  * extension is required.
  */
abstract class VecBinaryKernel extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got $l, $r")
  }
  override def dataType: DataType = LongType
}

/** Exact integer dot product Σ a_i·b_i of two `array<bigint>` columns. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryKernel {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Exact integer squared distance Σ (a_i−b_i)² of two `array<bigint>`
  * columns. */
case class VecSqDist(left: Expression, right: Expression) extends VecBinaryKernel {
  override def prettyName: String = "vec_sqdist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.sqdist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}

object VecKernels {
  /** Unequal-length inputs are a caller bug: the DSL twins return NULL
    * there (zip_with pads with null), but nullSafeEval/defineCodeGen
    * cannot emit a null result for non-null children — so rather than
    * silently truncating to the shorter array (a plausible-looking
    * WRONG number on the public SQL surface, found by review), fail
    * loudly. The property pin against the DSL twins covers the
    * equal-length domain both contracts share. */
  private def checkLen(x: Array[Long], y: Array[Long], op: String): Unit =
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"$op requires equal-length vectors, got ${x.length} and ${y.length}")

  /** Tight-loop Σ a_i·b_i; throws on unequal lengths. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    checkLen(x, y, "vec_dot")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Tight-loop Σ (a_i−b_i)²; throws on unequal lengths. */
  def sqdist(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    checkLen(x, y, "vec_sqdist")
    var s = 0L
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }
}
