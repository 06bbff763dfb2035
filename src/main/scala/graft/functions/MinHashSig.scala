package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native-codegen K=32 MinHash signature of a text column: tokenize,
  * 3-gram shingle, Murmur3-hash each shingle once, and fold all 32
  * affine minima in ONE fused per-row loop — `array<long>` out, NULL
  * for docs with fewer than 3 tokens (they have no shingles; the
  * row-based path drops them at the aggregate the same way).
  *
  * The distributed formulation (`MinHash.shingleRows` explode → 32
  * `min(pmod(...))` columns of a hash aggregate) stays the shared
  * spine of the Jaccard-verification paths, which genuinely need the
  * (id, shingle) relation. But the SIGNATURE is a pure per-row
  * function of the text, and computing it through an explode pushes
  * corpus × shingles rows through an aggregate update (32 pmods per
  * shingle row in agg code, map-side combine state per doc) — this
  * expression does the identical arithmetic in a tight loop with no
  * explode, no aggregate, no shuffle. Extension-ladder rung: scalar
  * Expression over composed ops when the composition forces data
  * movement the semantics don't need (SURVEY §7.3, the
  * [[HyperplaneCodes]] precedent).
  *
  * EXACTNESS contract (pinned row-for-row in `MinHashSpec`): this
  * must equal the row-based path bit-for-bit, so it reuses the very
  * primitives Spark's own expressions evaluate —
  * [[UTF8String.split]] (what `split(col, " ")` runs),
  * [[UTF8String.concatWs]] (what `concat_ws` runs), and
  * [[Murmur3_x86_32.hashUnsafeBytes]] with seed 42 (what `hash()`
  * runs on strings) — and min over the same integer multiset is
  * order-independent, so agg-vs-loop ordering cannot diverge.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinHashSig.compute($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Signature length. */
  val K = 32
  /** Mersenne prime 2^61-1: (a*h+b) mod P stays exact in Long
    * arithmetic (|h| < 2^32, a,b < 2^31 → |a*h+b| < 2^63). */
  val P = 2305843009213693951L

  /** Fixed-seed affine hash parameters — deterministic across JVMs;
    * the single source shared with the row-based `MinHash.signatures`
    * aggregate. */
  val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(1234567L)
    val a = Array.fill(K)(rnd.nextInt(Int.MaxValue - 1).toLong + 1L)
    val b = Array.fill(K)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval AND generated code. Returns
    * null for docs with fewer than 3 tokens. */
  def compute(text: UTF8String): ArrayData = {
    // the same primitive split(col, " ") evaluates (limit -1: keep
    // trailing empty tokens, exactly like the row-based path)
    val toks = text.split(Space, -1)
    val n = toks.length
    if (n < 3) return null
    val sigs = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concatWs(Space, toks(i), toks(i + 1), toks(i + 2))
      // hash() on strings = Murmur3 over the UTF-8 bytes, seed 42;
      // cast to long sign-extends like CAST(hash(x) AS BIGINT)
      val h: Long = Murmur3_x86_32.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42).toLong
      var k = 0
      while (k < K) {
        val x = h * as(k) + bs(k)
        val r = x % P
        val v = if (r < 0) r + P else r
        if (v < sigs(k)) sigs(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text)))
}
