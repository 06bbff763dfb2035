package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native as-of join — the whole-operator Catalyst extension
  * (SURVEY.md §7.3's capability ladder: after custom expressions
  * (RollingHash), generators (CharNGrams), aggregators (SecondMax) and
  * a DSv2 source (CensusSource), this is the custom
  * LogicalPlan + Strategy + SparkPlan rung).
  *
  * Semantics: for every left row, the single GREATEST right row (by the
  * right `order` tuple, compared lexicographically) with equal join
  * keys and order tuple STRICTLY below the left row's — "the latest
  * prior event". Left rows without a match keep NULLs on the right
  * (left-outer). NULL keys group together (same as
  * `Window.partitionBy`, which the window-trick form C10 uses — the two
  * implementations agree row-for-row, pinned by `AsOfJoinSpec`).
  *
  * Scale shape — two physical forms, selected by [[AsOfJoinStrategy]]
  * on the right side's estimated size (mirroring Spark's own
  * JoinSelection):
  *  - [[AsOfJoinExec]] (merge): both sides hash-partition on the keys
  *    and sort within partitions by (keys, order) — one shuffle each,
  *    exactly a sort-merge join's movement — then a single forward
  *    merge pass per partition with O(1) state. No window over a
  *    union (the C10 trick carries every probe row through window
  *    state), no range-join candidate blowup; the right side streams,
  *    never buffered per key.
  *  - [[BroadcastAsOfJoinExec]]: a small right side broadcasts and
  *    the big probe side moves NOTHING — no shuffle, no sort; hash
  *    lookup + binary search per probe row.
  */
/** Match direction — the pandas `merge_asof` surface: [[AsOfBackward]]
  * takes the greatest right row strictly BEFORE the left row (the
  * default, "latest prior"); [[AsOfForward]] the smallest right row
  * strictly AFTER it ("earliest next"); [[AsOfNearest]] whichever of
  * those two is closer by ABSOLUTE gap on the FIRST order column
  * (equal gaps prefer the backward match — the declared tie rule).
  * All strict, symmetrically: a right row whose order tuple EQUALS
  * the left's matches in no direction. */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length &&
    leftOrder.length == rightOrder.length && leftOrder.nonEmpty)
  require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
  // tolerance bounds — and the nearest direction MEASURES — the gap on
  // the FIRST order column (the pandas `on` key; trailing order columns
  // only tie-break), so both need a numeric/temporal primary order —
  // validated here, at plan build
  if (tolerance.isDefined || direction == AsOfNearest) {
    AsOf.firstOrdGetter(leftOrder.head.dataType)
    AsOf.firstOrdGetter(rightOrder.head.dataType)
    ()
  }
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] — injected via `graft.GraftExtensions`
  * (production) or `spark.experimental.extraStrategies`
  * ([[AsOf.ensureStrategy]]). Physical selection mirrors Spark's own
  * JoinSelection: a right side whose estimated size fits under
  * `spark.sql.autoBroadcastJoinThreshold` plans as the zero-shuffle
  * [[BroadcastAsOfJoinExec]]; otherwise the co-partitioned merge
  * [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, dir, tol) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, dir, tol) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, dir, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys (one shuffle per
  * side, inserted by EnsureRequirements), sorted within partitions by
  * (keys, order), merged in one forward pass. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val ordTypes = leftOrder.map(_.dataType)
    val fwd = direction == AsOfForward
    val near = direction == AsOfNearest
    val hasTol = tolerance.isDefined
    val tolV = tolerance.getOrElse(0L)
    val needGet = hasTol || near
    val lOrdGet = if (needGet) AsOf.firstOrdGetter(leftOrder.head.dataType) else null
    val rOrdGet = if (needGet) AsOf.firstOrdGetter(rightOrder.head.dataType) else null
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lOrdProj = UnsafeProjection.create(leftOrder, left.output)
      val rOrdProj = UnsafeProjection.create(rightOrder, right.output)
      // natural ascending, nulls first: null keys compare equal (the
      // partitionBy-grouping semantics documented above)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      // bind against `output` (right side nullability forced true), NOT
      // left.output ++ right.output: binding to the original
      // non-nullable right attrs would skip the null check and read
      // garbage zeros from the null-padding row on unmatched left rows
      val outProj = UnsafeProjection.create(output, output)
      def advanceRightOf(it: Iterator[InternalRow]): InternalRow =
        if (it.hasNext) it.next() else null

      if (fwd) new Iterator[InternalRow] {
        // forward needs NO candidate state: with both sides sorted
        // ascending, skipping every right row at-or-before the left
        // row leaves rCur as the earliest strictly-after row — the
        // match iff its key equals the left's. Nothing is consumed
        // that a later (larger) left row could still need.
        private var rCur: InternalRow = advanceRightOf(rIter)
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lo = lOrdProj(l)
          var skipping = true
          while (skipping && rCur != null) {
            val kc = keyOrd.compare(rKeyProj(rCur), lk)
            if (kc < 0 || (kc == 0 && ordOrd.compare(rOrdProj(rCur), lo) <= 0))
              rCur = advanceRightOf(rIter)
            else skipping = false
          }
          val matched = rCur != null &&
            keyOrd.compare(rKeyProj(rCur), lk) == 0 &&
            (!hasTol || rOrdGet(rOrdProj(rCur)) - lOrdGet(lo) <= tolV)
          outProj(joined(l, if (matched) rCur else nullRight))
        }
      } else if (near) new Iterator[InternalRow] {
        // nearest = strict-backward candidate (carried, like the
        // backward branch) vs strict-forward candidate (rCur, like the
        // forward branch), closer FIRST-order gap wins, tie → backward.
        // One wrinkle forces a SECOND carried row: rows whose order
        // tuple EQUALS the current left's match neither direction for
        // THIS left row but are the backward answer for LATER (larger)
        // left rows — so they must be consumed into state. Slot A holds
        // the last consumed qualifying row (ord ≤ current lo), slot B
        // the greatest consumed row with ord strictly below A's; the
        // backward candidate is A when A's ord < lo, else B. All slots
        // are reused byte buffers; A→B promotion SWAPS buffers (no
        // byte copy in the hot loop — the r8 allocation discipline).
        final class Slot(width: Int) {
          var row: InternalRow = _
          private var buf: UnsafeRow = _
          def set(r: InternalRow): Unit = r match {
            case u: UnsafeRow =>
              if (buf == null) {
                buf = new UnsafeRow(width)
                buf.pointTo(new Array[Byte](u.getSizeInBytes), u.getSizeInBytes)
              }
              buf.copyFrom(u)
              row = buf
            case other => row = other.copy()
          }
          /** Takes `other`'s content by reference; `other` inherits
            * this slot's old buffer for its next set(). */
          def stealFrom(other: Slot): Unit = {
            val r = row; val b = buf
            row = other.row; buf = other.buf
            other.row = r; other.buf = b
          }
        }
        private var rCur: InternalRow = advanceRightOf(rIter)
        private val rowA = new Slot(right.output.length)
        private val ordA = new Slot(rightOrder.length)
        private val rowB = new Slot(right.output.length)
        private val ordB = new Slot(rightOrder.length)
        private val keySlot = new Slot(leftKeys.length)
        private var hasA = false
        private var hasB = false
        private var hasKey = false
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lo = lOrdProj(l)
          var advancing = true
          while (advancing && rCur != null) {
            val kc = keyOrd.compare(rKeyProj(rCur), lk)
            if (kc < 0) rCur = advanceRightOf(rIter)
            else if (kc == 0 && ordOrd.compare(rOrdProj(rCur), lo) <= 0) {
              if (!hasKey || keyOrd.compare(keySlot.row, lk) != 0) {
                hasA = false; hasB = false
                keySlot.set(lk); hasKey = true
              }
              val ro = rOrdProj(rCur)
              if (!hasA) { rowA.set(rCur); ordA.set(ro); hasA = true }
              else if (ordOrd.compare(ro, ordA.row) > 0) {
                rowB.stealFrom(rowA); ordB.stealFrom(ordA); hasB = true
                rowA.set(rCur); ordA.set(ro)
              } else {
                // equal order tuple (ascending sort admits nothing
                // less): the later row overwrites A, B unchanged
                rowA.set(rCur)
              }
              rCur = advanceRightOf(rIter)
            } else advancing = false
          }
          val sameKey = hasKey && keyOrd.compare(keySlot.row, lk) == 0
          var bRow: InternalRow = null
          var bOrd: InternalRow = null
          if (sameKey && hasA) {
            if (ordOrd.compare(ordA.row, lo) < 0) { bRow = rowA.row; bOrd = ordA.row }
            else if (hasB) { bRow = rowB.row; bOrd = ordB.row }
          }
          val fRow: InternalRow =
            if (rCur != null && keyOrd.compare(rKeyProj(rCur), lk) == 0) rCur
            else null
          val loV = lOrdGet(lo)
          var db = if (bRow != null) loV - rOrdGet(bOrd) else Long.MaxValue
          var df = if (fRow != null) rOrdGet(rOrdProj(fRow)) - loV else Long.MaxValue
          if (hasTol) {
            if (db > tolV) db = Long.MaxValue
            if (df > tolV) df = Long.MaxValue
          }
          val chosen =
            if (db == Long.MaxValue && df == Long.MaxValue) nullRight
            else if (db <= df) bRow // tie → backward (declared rule)
            else fRow
          outProj(joined(l, chosen))
        }
      } else new Iterator[InternalRow] {
        private var rCur: InternalRow = advanceRightOf(rIter)
        // the greatest right row seen with key == candKey and order
        // below the current left row — O(1) merge state. Both live in
        // REUSED byte[]-backed buffers: one fresh copy per qualifying
        // right row was O(|right|) allocation in the hot merge loop,
        // and the key only changes per key GROUP (r8 advice #3)
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _
        private var rowBuf: UnsafeRow = _
        private var keyBuf: UnsafeRow = _
        private def saveCand(r: InternalRow): Unit = r match {
          case u: UnsafeRow =>
            if (rowBuf == null) {
              rowBuf = new UnsafeRow(right.output.length)
              rowBuf.pointTo(new Array[Byte](u.getSizeInBytes), u.getSizeInBytes)
            }
            rowBuf.copyFrom(u)
            cand = rowBuf
          case other => cand = other.copy() // non-unsafe rows: plain copy
        }
        private def saveKey(k: UnsafeRow): Unit = {
          if (keyBuf == null) {
            keyBuf = new UnsafeRow(leftKeys.length)
            keyBuf.pointTo(new Array[Byte](k.getSizeInBytes), k.getSizeInBytes)
          }
          keyBuf.copyFrom(k)
          candKey = keyBuf
        }
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lo = lOrdProj(l)
          var advancing = true
          while (advancing && rCur != null) {
            val kc = keyOrd.compare(rKeyProj(rCur), lk)
            if (kc < 0) rCur = advanceRightOf(rIter) // behind every future left key too
            else if (kc == 0 && ordOrd.compare(rOrdProj(rCur), lo) < 0) {
              // qualifies; later qualifying rows overwrite it (sorted
              // ascending, so the last one consumed is the greatest)
              saveCand(rCur)
              if (candKey == null || keyOrd.compare(candKey, lk) != 0) saveKey(lk)
              rCur = advanceRightOf(rIter)
            } else advancing = false // right is at/after the left row
          }
          val matched = candKey != null && keyOrd.compare(candKey, lk) == 0 &&
            (!hasTol || lOrdGet(lo) - rOrdGet(rOrdProj(cand)) <= tolV)
          outProj(joined(l, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the whole (small) right side broadcasts and
  * the left side is consumed AS-IS — no shuffle, no sort on either
  * side, exactly the movement a BroadcastHashJoin saves over a
  * sort-merge join. Each task groups the broadcast rows per key with
  * order-sorted arrays (built per task from the shared broadcast — the
  * build is O(|right| log |right|) on an already-small side) and
  * answers every left row with one hash lookup + binary search for the
  * greatest order tuple strictly below the probe's. */
case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val ordTypes = leftOrder.map(_.dataType)
    val fwd = direction == AsOfForward
    val near = direction == AsOfNearest
    val hasTol = tolerance.isDefined
    val tolV = tolerance.getOrElse(0L)
    val needGet = hasTol || near
    val lOrdGet = if (needGet) AsOf.firstOrdGetter(leftOrder.head.dataType) else null
    val rOrdGet = if (needGet) AsOf.firstOrdGetter(rightOrder.head.dataType) else null
    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val rOrdProj = UnsafeProjection.create(rightOrder, right.output)
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lOrdProj = UnsafeProjection.create(leftOrder, left.output)
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      // group the broadcast rows by key; each group sorted by order
      // tuple (precomputed — a shared projection buffer can't serve
      // two operands of one comparison)
      val byKey = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]()
      for (r <- broadcastRel.value) {
        val k = rKeyProj(r).copy()
        var buf = byKey.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty
          byKey.put(k, buf)
        }
        buf += ((rOrdProj(r).copy(), r))
      }
      val entryOrd = Ordering.fromLessThan[(UnsafeRow, InternalRow)](
        (a, b) => ordOrd.compare(a._1, b._1) < 0)
      byKey.values().forEach(buf => { buf.sortInPlace()(entryOrd); () })
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      lIter.map { l =>
        val group = byKey.get(lKeyProj(l))
        var matched: InternalRow = null
        if (group != null) {
          val lo = lOrdProj(l)
          if (near) {
            // both binary searches off one sorted group: the smallest
            // entry strictly above lo and the greatest strictly below
            var low = 0
            var high = group.length // invariant: [0,low) <= lo
            while (low < high) {
              val mid = (low + high) >>> 1
              if (ordOrd.compare(group(mid)._1, lo) <= 0) low = mid + 1
              else high = mid
            }
            val fIdx = low
            low = 0
            high = group.length // invariant: [0,low) < lo
            while (low < high) {
              val mid = (low + high) >>> 1
              if (ordOrd.compare(group(mid)._1, lo) < 0) low = mid + 1
              else high = mid
            }
            val bIdx = low - 1
            val loV = lOrdGet(lo)
            var db = if (bIdx >= 0) loV - rOrdGet(group(bIdx)._1) else Long.MaxValue
            var df = if (fIdx < group.length) rOrdGet(group(fIdx)._1) - loV
              else Long.MaxValue
            if (hasTol) {
              if (db > tolV) db = Long.MaxValue
              if (df > tolV) df = Long.MaxValue
            }
            if (db != Long.MaxValue || df != Long.MaxValue)
              matched = if (db <= df) group(bIdx)._2 // tie → backward
                else group(fIdx)._2
          } else if (fwd) {
            // smallest entry with ord strictly above lo
            var low = 0
            var high = group.length // exclusive; invariant: [0,low) <= lo
            while (low < high) {
              val mid = (low + high) >>> 1
              if (ordOrd.compare(group(mid)._1, lo) <= 0) low = mid + 1
              else high = mid
            }
            if (low < group.length &&
                (!hasTol || rOrdGet(group(low)._1) - lOrdGet(lo) <= tolV))
              matched = group(low)._2
          } else {
            // greatest entry with ord strictly below lo
            var low = 0
            var high = group.length // exclusive; invariant: [0,low) < lo
            while (low < high) {
              val mid = (low + high) >>> 1
              if (ordOrd.compare(group(mid)._1, lo) < 0) low = mid + 1
              else high = mid
            }
            if (low > 0 &&
                (!hasTol || lOrdGet(lo) - rOrdGet(group(low - 1)._1) <= tolV))
              matched = group(low - 1)._2
          }
        }
        outProj(joined(l, if (matched != null) matched else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry point for the native as-of join. */
object AsOf {

  /** Long extractor for a tolerance-eligible first order column —
    * numeric/temporal only (the pandas `merge_asof` tolerance
    * contract); timestamps compare in microseconds, dates in days. */
  private[plans] def firstOrdGetter(
      dt: org.apache.spark.sql.types.DataType): InternalRow => Long = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(0)
      case IntegerType | DateType => r => r.getInt(0).toLong
      case ShortType => r => r.getShort(0).toLong
      case ByteType => r => r.getByte(0).toLong
      case other => throw new IllegalArgumentException(
        s"as-of tolerance needs an integral/temporal primary order column, got $other")
    }
  }

  /** Register [[AsOfJoinStrategy]] + [[AsOfJoinOptimization]] on the
    * session if absent — the imperative path for sessions built
    * without `spark.sql.extensions=graft.GraftExtensions`. */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinOptimization))
      spark.experimental.extraOptimizations =
        AsOfJoinOptimization +: spark.experimental.extraOptimizations
  }

  /** As-of join `left` with `right`: per left row, the greatest right
    * row with equal `keys` and (order tuple) strictly before the left
    * row's (`direction = "backward"`, the default) — the smallest
    * strictly after it (`"forward"`) — or whichever of those two is
    * closer by absolute gap on the FIRST order column (`"nearest"`;
    * equal gaps prefer backward); unmatched left rows keep NULL
    * right columns. `tolerance` (pandas `merge_asof` surface) bounds
    * the allowed gap on the FIRST order column, in that column's units
    * (microseconds for timestamps, days for dates): a nearest row
    * farther than the tolerance yields NULLs, never a farther
    * fallback. Column names are resolved case-sensitively against
    * each side; the caller renames the right side first when names
    * collide (as with any self-join). */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftOrder: Seq[String], rightOrder: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val dir = direction match {
      case "backward" => AsOfBackward
      case "forward" => AsOfForward
      case "nearest" => AsOfNearest
      case other => throw new IllegalArgumentException(
        s"""direction must be "backward", "forward" or "nearest", got "$other"""")
    }
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = org.apache.spark.sql.graft.Bridge.analyzedPlan(left)
    val rPlan = org.apache.spark.sql.graft.Bridge.analyzedPlan(right)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
        leftOrder.map(resolve(lPlan, _)), rightOrder.map(resolve(rPlan, _)),
        dir, tolerance))
  }
}
