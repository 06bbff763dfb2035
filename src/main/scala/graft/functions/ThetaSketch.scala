package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set algebra (Apache DataSketches) — the
  * mergeable sketch family that, unlike HLL (D18), supports set
  * INTERSECTION and DIFFERENCE estimates, answering "how many distinct
  * members do two corpora share / have exclusively" without an exact
  * pair-verified join (the sketch-scale complement of K36's
  * `dedup_source_overlap`).
  *
  * [[ThetaSketchAgg]] is a native `TypedImperativeAggregate` — the same
  * execution shape as Spark's built-in `hll_sketch_agg`: the aggregation
  * buffer is the LIVE `Union` object while a partition aggregates
  * (per-row update touches heap longs, no serialization), and the
  * sketch serializes to its compact byte form only when a partial
  * buffer crosses the shuffle. Map-side combine therefore ships one
  * ≤ 8·2^lgK-byte blob per (group × partition) regardless of input
  * cardinality — the property that makes sketch aggregation scale like
  * a built-in at 100 TB.
  *
  * The scalar estimators ([[ThetaEstimate]], [[ThetaSetEstimate]])
  * operate on the handful of grouped sketch blobs AFTER aggregation —
  * frames of single-digit rows — so they are `CodegenFallback`
  * (interpreted) by design: codegen would optimize the cold path while
  * complicating the review surface.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaSketchAgg.DefaultLgK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new UnsupportedOperationException(
        s"theta_sketch_agg: unsupported input type $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  /** Final form: the compact, immutable, wire-stable byte encoding —
    * what a pipeline persists next to its partition metadata. */
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
}

object ThetaSketchAgg {
  /** 2^12 nominal entries ≈ 2.6% relative standard error — the D9/D18
    * sketch-size discipline (≤ 5% test bound = ~2 standard errors). */
  val DefaultLgK = 12
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(BinaryType)
  override protected def nullSafeEval(bytes: Any): Any =
    Sketch.wrap(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getEstimate
  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Set-algebra estimate over two serialized theta sketches:
  * `op` ∈ union | intersect | a_not_b. This is the capability HLL
  * lacks — theta sketches retain hashed samples below θ, so
  * intersections and differences compose with bounded error instead of
  * inclusion-exclusion's error blow-up. */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  require(ThetaSetEstimate.Ops(op), s"theta op must be one of ${ThetaSetEstimate.Ops}")
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(BinaryType, BinaryType)
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketch.wrap(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketch.wrap(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    val builder = SetOperation.builder()
    op match {
      case "union"     => builder.buildUnion().union(a, b).getEstimate
      case "intersect" => builder.buildIntersection().intersect(a, b).getEstimate
      case "a_not_b"   => builder.buildANotB().aNotB(a, b).getEstimate
    }
  }
  override def prettyName: String = s"theta_$op"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaSetEstimate {
  val Ops: Set[String] = Set("union", "intersect", "a_not_b")
}
