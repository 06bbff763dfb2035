package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native-codegen 64-bit SimHash fingerprint of a text column:
  * tokenize, xxhash64 each token, fold the 64 signed bit counters, and
  * emit the sign fingerprint — all in ONE fused per-row loop.
  *
  * Replaces the distributed formulation on the registered path
  * (`SimHash.fingerprints`: explode tokens → 64 conditional-sum
  * aggregate columns), which pushes corpus × tokens rows through an
  * aggregate with 64 counter updates each. The fingerprint is a pure
  * per-row function of the text, so the extension ladder says scalar
  * Expression ([[HyperplaneCodes]] / [[MinHashSig]] precedent): a
  * narrow projection, no explode, no aggregate, no shuffle.
  *
  * EXACTNESS contract (pinned row-for-row in `SimHashSpec`): reuses
  * the primitives the row-based path evaluates — [[UTF8String.split]]
  * (what `split(col, " ")` runs; empty tokens kept like explode does)
  * and [[XXH64.hashUnsafeBytes]] with seed 42 (what `xxhash64()` runs
  * on strings) — and the per-bit counter sum is integer and
  * commutative, so agg-vs-loop ordering cannot diverge. Tie rule
  * identical: a zero counter leaves the bit 0.
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHashFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashFp.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  val Bits = 64
  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval AND generated code. Total for
    * every non-null input: split("") yields one empty token, so a
    * fingerprint always exists (matching explode-of-split, which never
    * produces an empty token array). */
  def compute(text: UTF8String): Long = {
    val toks = text.split(Space, -1)
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // xxhash64() on strings = XXH64 over the UTF-8 bytes, seed 42
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(SimHashFp(ColumnBridge.expression(text)))
}
