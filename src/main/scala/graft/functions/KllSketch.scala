package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType}

/** KLL quantile sketch (Apache DataSketches; Karnin-Lang-Liberty,
  * FOCS'16) — the MERGEABLE quantile summary that closes the sketch
  * family next to HLL (D9/D18, distincts), CMS (D17, frequencies) and
  * theta (D19, set algebra): D15's built-in `percentile_approx` is a
  * single-pass GK variant whose summary is NOT a first-class value —
  * it cannot be persisted per partition and rolled up later. The KLL
  * blob can: a pipeline sketches each ingest batch / partition ONCE,
  * stores the ≤ few-KB blob next to its partition metadata (the D25
  * persistence discipline), and answers any later quantile question —
  * over any UNION of partitions — by merging blobs, never rescanning
  * data. That partition-mergeable shape is what a 100 TB latency or
  * price distribution query rides.
  *
  * [[KllSketchAgg]] is a native `TypedImperativeAggregate` like
  * [[ThetaSketchAgg]]: the buffer is the live heap sketch while a
  * partition aggregates (per-row update, no serialization); the blob
  * only crosses the shuffle at partial-merge time — one ≤ O(k·log n)
  * bytes blob per (group × partition) regardless of input cardinality.
  *
  * Determinism caveat, declared: KLL compaction consumes random bits
  * (the level-offset coin flip of the paper), so two aggregations of
  * the same data may yield different — equally valid — summaries.
  * The error CONTRACT is what is pinned (`AggregatesSpec`): at k=200
  * the normalized rank error is ≤ ~1.65% (two-sided, 99%), so every
  * estimated quantile must sit within ±2ε ranks of the exact order
  * statistic. Queries built on it are registered rows-only, exactly
  * like the other sketch rungs. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketchAgg.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  // analysis-time contract: a STRING child fails with a clean
  // AnalysisException at resolution, never a per-row throw mid-job.
  // (ExpectsInputTypes can't express "any numeric" here: the
  // NumericType COMPANION and AbstractDataType are private[sql].)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a numeric child, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  // the type dispatch resolved ONCE at plan time, not re-matched per row
  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType     => v => v.asInstanceOf[Double]
    case FloatType      => v => v.asInstanceOf[Float].toDouble
    case LongType       => v => v.asInstanceOf[Long].toDouble
    case IntegerType    => v => v.asInstanceOf[Int].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case dt             => v => v.asInstanceOf[Number].doubleValue()
  }

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(toDouble(v))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  /** Final form: the compact wire encoding — what a pipeline persists
    * per partition and merges at question time. */
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  // heapify already yields an updatable heap sketch of the same k —
  // merging it into a fresh buffer would pay a second O(k·log n)
  // compaction per blob on the shuffle-merge path for nothing
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
}

object KllSketchAgg {
  /** k=200 ⇒ normalized rank error ≈ 1.65% (two-sided, 99% conf) —
    * the DataSketches default, matching the ≤ 5% family test bound
    * at ~2 standard errors. */
  val DefaultK = 200
}

/** Quantile estimate at normalized rank `p` from a serialized KLL
  * blob. Operates on the handful of grouped blobs AFTER aggregation
  * (single-digit-row frames) — `CodegenFallback` by design, the
  * [[ThetaEstimate]] discipline. NULL on an empty sketch (a group
  * with only NULL inputs), never a throw. `ImplicitCastInputTypes`
  * so the SQL-surface literal `0.5` (parsed DECIMAL(1,1)) coerces —
  * `ExpectsInputTypes` alone only CHECKS and would reject the
  * documented usage. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(BinaryType, DoubleType)
  override protected def nullSafeEval(bytes: Any, rank: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(rank.asInstanceOf[Double])
  }
  override def prettyName: String = "kll_quantile"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
