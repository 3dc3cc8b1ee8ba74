package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the winnowing-style document
  * fingerprint: the minimum over all [[ShingleMinHash.W]]-codepoint
  * windows of a Rabin–Karp polynomial hash (base [[ShingleMinHash.B]]
  * mod [[ShingleMinHash.P]]), zero-padding documents shorter than one
  * window.
  *
  * Value-identical to the Column-DSL formulation in
  * [[graft.pipeline.TextOps.fingerprints]] (pinned by a property test) and
  * to the DuckDB oracle spelling, but O(n) instead of O(W·n): the rolling
  * update drops the leading codepoint and appends the next one per step,
  * where the declarative form re-sums all W terms per window and first
  * materializes a boxed codepoint array. Codegen emits a single static
  * call — the loop itself is plain JIT-compiled Java, not a per-element
  * interpreted lambda (and unlike a W-term unrolled Column expression it
  * can never outgrow the JIT's method-size limit).
  *
  * Registered as SQL function `shingle_min_hash` by
  * [[graft.GraftExtensions]]; reach it with
  * `functions.call_function("shingle_min_hash", col)`.
  */
case class ShingleMinHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_min_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_min_hash"

  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${ShingleMinHash.getClass.getName.stripSuffix("$")}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  /** Window width / hash base / modulus — shared constants with the
    * Column-DSL and DuckDB spellings (graft.pipeline.TextOps). */
  val W = 8
  val B = 131L
  val P = 1000000007L
  /** B^(W-1) mod P — the weight of a window's leading codepoint. */
  private val PowW1: Long =
    (1 until W).foldLeft(1L)((a, _) => a * B % P)

  /** Min rolling hash over all W-codepoint windows of `s`.
    *
    * Window i (0-based, i in 0 until max(n-W+1, 1)) hashes codepoints
    * i..i+W-1 as Σ c_j · B^(W-1-(j-i)) mod P with c_j = 0 past the end —
    * the exact zero-padding the DSL's out-of-range element_at → 0 gives,
    * including the empty string (the DSL's split("") yields [""] whose
    * ascii is 0: one all-zero window, hash 0). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cs = new Array[Int](math.max(n, W))
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cs(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    // initial window (indices 0..W-1; zero-padded when n < W)
    var h = 0L
    var j = 0
    while (j < W) {
      h = (h * B + cs(j)) % P
      j += 1
    }
    var min = h
    val nWin = math.max(n - W + 1, 1)
    var i = 1
    while (i < nWin) {
      // drop codepoint i-1, append codepoint i+W-1
      val lead = cs(i - 1) * PowW1 % P
      h = ((h - lead + P) % P * B + cs(i + W - 1)) % P
      min = math.min(min, h)
      i += 1
    }
    min
  }
}
