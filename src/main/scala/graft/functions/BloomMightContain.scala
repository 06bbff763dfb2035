package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch the
  * `df.stat.bloomFilter` API builds): `might_contain(col)` as a
  * codegen'd per-row boolean — the pre-filter that turns a
  * corpus-scale semi-join into a narrow projection.
  *
  * Why this exists at 100 TB: the decontamination join (K29) streams
  * EVERY corpus shingle into a join against the benchmark set. When
  * the benchmark is small the broadcast hash join already is the
  * filter; when it outgrows the broadcast threshold the join
  * shuffles the full corpus shingle stream. A Bloom filter of the
  * benchmark is ~10× smaller than the hash relation at 1% fpp, ships
  * to every task as ONE expression reference, and prunes the stream
  * to candidates BEFORE any exchange. Bloom filters have NO false
  * negatives, so a downstream exact join restores exactness — the
  * composed result is bit-identical to the unfiltered join (pinned in
  * `LlmDataSpec`), the filter only cuts the data that moves.
  *
  * The probe hashes the UTF-8 bytes of the input
  * (`mightContainBinary`), exactly what the builder's `putString`
  * hashed — a UTF8String → String round-trip would only add per-row
  * allocation. Standard null propagation (NULL in → NULL out): in the
  * Filter position this expression lives in, NULL drops the row —
  * identical to the exact join, which never matches NULL keys. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BooleanType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    BloomMightContain.probe(bloom, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomMightContain.probe($bRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Shared kernel for interpreted eval AND generated code. */
  def probe(bloom: BloomFilter, s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  def apply(col: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(col), bloom))
}
