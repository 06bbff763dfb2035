package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** [[BloomMightContain]]'s LONG-keyed sibling: `might_contain(key)`
  * against a BloomFilter built over a BIGINT join key
  * (`df.stat.bloomFilter` on a long column hashes via `putLong` —
  * this probe calls the matching `mightContainLong`, no boxing, no
  * string rendering).
  *
  * The 100-TB position is the SEMI-JOIN pre-filter (C46): "fact rows
  * whose key appears in a filtered dimension subset" broadcasts the
  * subset when it is small — but between the broadcast threshold and
  * fact scale there is a wide band where the subset's HASH RELATION
  * is too big to ship yet a 1%-fpp Bloom of its keys is ~10× smaller
  * and prunes the fact stream to candidates BEFORE the shuffle the
  * exact join still performs. No false negatives → the exact join
  * after the filter returns the identical row set (pinned in
  * `JoinsSpec`); the bloom only cuts the bytes that move. Codegen'd
  * (`doGenCode` below) so the probe rides inside the scan's
  * WholeStageCodegen span instead of forcing an interpreted filter.
  * Standard null propagation: NULL key → NULL → the Filter drops the
  * row, identical to the exact join which never matches NULL keys. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = BooleanType
  override def inputTypes = Seq(LongType)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(col: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(col), bloom))
}
