package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native band (interval-range) join — the second whole-operator
  * Catalyst extension after [[AsOfJoin]] (round-9 verdict item 8).
  *
  * Semantics: inner join of `left` and `right` on equal `keys` (SQL
  * equality — NULL never matches) with the right order value inside
  * the HALF-OPEN band anchored at the left order value:
  * `rightOrd - leftOrd ∈ [lower, upper)`, offsets in the order
  * column's native unit (microseconds for timestamps, days for
  * dates). This is C9's "clicks within 5 minutes after a view"
  * shape: `lower = 0, upper = 5 min`.
  *
  * Why a native operator: Spark plans an equi-key + band predicate as
  * a sort-merge join on the key with the band as a RESIDUAL filter —
  * every same-key pair is materialized before the band filters it,
  * O(|key group|²) per key. On an events table whose per-user history
  * grows with retention, the residual form degrades quadratically at
  * 100×; the band merge below is O(|left| + |right| + |output|) with
  * buffer memory bounded by the densest single band window, never the
  * key group.
  *
  * Physical shape ([[RangeJoinExec]]): both sides hash-partition on
  * the keys and sort within partitions by (keys, ord) — exactly a
  * sort-merge join's movement, one shuffle each — then one forward
  * sliding-window pass per partition: each right row is admitted to a
  * ring buffer once, pruned once (both sides' ord monotonicity makes
  * admitted-then-expired rows dead for every later left row), and
  * paired with each left row whose band covers it.
  */
case class RangeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Expression, rightOrd: Expression,
    lower: Long, upper: Long)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require(lower < upper, s"empty band [$lower, $upper)")
  // the band arithmetic needs a numeric/temporal order column on both
  // sides — validated here, at plan build (same contract as the as-of
  // tolerance)
  AsOf.firstOrdGetter(leftOrd.dataType)
  AsOf.firstOrdGetter(rightOrd.dataType)

  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoin]] — injected via `graft.GraftExtensions`
  * (production) or `spark.experimental.extraStrategies`
  * ([[RangeJoins.ensureStrategy]]). Always the co-partitioned band
  * merge: unlike as-of (one match per probe, where a broadcast
  * hash+binary-search side-steps the shuffle), a band join's natural
  * inputs are two LARGE event sets — the merge is the scale shape. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lk, rk, lo, ro, lower, upper) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lo, ro,
        lower, upper) :: Nil
    case _ => Nil
  }
}

/** Physical band join: co-partitioned on the keys (one shuffle per
  * side, inserted by EnsureRequirements), sorted within partitions by
  * (keys, ord), joined in one sliding-window merge pass.
  *
  * Invariants the single pass relies on (both from the required
  * ascending (keys, ord) order):
  *  - a right row with key below the current left key is dead for
  *    every later left row (left keys ascend);
  *  - a same-key right row with `ord < leftOrd + lower` is dead for
  *    every later left row too (left ords ascend within the key), so
  *    buffer pruning at the head is final;
  *  - a same-key right row with `ord >= leftOrd + upper` stops the
  *    scan — nothing after it (larger ords) can match the current
  *    left row, and it stays current for the next one.
  * Buffer occupancy is therefore exactly the right rows inside ONE
  * band window — bounded by band width × peak key rate, independent
  * of key-group size (the residual-filter SMJ buffers the whole key
  * group). */
case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Expression, rightOrd: Expression,
    lower: Long, upper: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightOrd).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOrdGet = AsOf.firstOrdGetter(leftOrd.dataType)
    val rOrdGet = AsOf.firstOrdGetter(rightOrd.dataType)
    val lo = lower
    val hi = upper
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lOrdProj = UnsafeProjection.create(Seq(leftOrd), left.output)
      val rOrdProj = UnsafeProjection.create(Seq(rightOrd), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      // right rows inside the current band window, as (ordValue, copy)
      // — copies because the sorted stream reuses its UnsafeRow
      val buf = new java.util.ArrayDeque[(Long, InternalRow)]()
      // the key the buffered rows belong to (a private copy)
      var bufKey: org.apache.spark.sql.catalyst.expressions.UnsafeRow = null

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var curLeft: InternalRow = _
        private var pending: java.util.Iterator[(Long, InternalRow)] =
          java.util.Collections.emptyIterator()

        /** Advance to the next left row with at least one match and
          * load its matches into `pending`. */
        private def fill(): Unit = {
          while (!pending.hasNext && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lov = lOrdProj(l)
            // SQL inner-join semantics: NULL keys / NULL order never match
            if (!lk.anyNull && !lov.isNullAt(0)) {
              val lord = lOrdGet(lov)
              // new key group: the buffer's rows are dead (left keys ascend)
              if (bufKey == null || keyOrd.compare(bufKey, lk) != 0) {
                buf.clear()
                bufKey = lk.copy()
              }
              // prune expired heads: ord < lord + lo is dead for every
              // later left row of this group too
              while (!buf.isEmpty && buf.peekFirst()._1 < lord + lo)
                buf.pollFirst()
              // admit from the right stream: skip dead rows, buffer
              // in-band rows, stop at the first beyond-band row
              var scanning = true
              while (scanning && rCur != null) {
                val rk = rKeyProj(rCur)
                val kc =
                  if (rk.anyNull) -1 // NULL right key matches nothing; skip
                  else keyOrd.compare(rk, lk)
                if (kc < 0) rCur = if (rIter.hasNext) rIter.next() else null
                else if (kc == 0) {
                  val rov = rOrdProj(rCur)
                  if (rov.isNullAt(0)) {
                    rCur = if (rIter.hasNext) rIter.next() else null
                  } else {
                    val rord = rOrdGet(rov)
                    if (rord < lord + lo) {
                      rCur = if (rIter.hasNext) rIter.next() else null
                    } else if (rord < lord + hi) {
                      buf.addLast((rord, rCur.copy()))
                      rCur = if (rIter.hasNext) rIter.next() else null
                    } else scanning = false
                  }
                } else scanning = false
              }
              if (!buf.isEmpty) {
                curLeft = l
                pending = buf.iterator()
              }
            }
          }
        }

        override def hasNext: Boolean = { fill(); pending.hasNext }
        override def next(): InternalRow = {
          fill()
          outProj(joined(curLeft, pending.next()._2))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry point for the native band join. */
object RangeJoins {

  /** Register [[RangeJoinStrategy]] + [[RangeJoinOptimization]] on the
    * session if absent — the imperative path for sessions built
    * without `spark.sql.extensions=graft.GraftExtensions`. Strategy
    * and optimizer rule always arrive together so a filter/projection
    * above a programmatically-built band join still reaches the
    * scans. */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        RangeJoinStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.contains(RangeJoinOptimization))
      spark.experimental.extraOptimizations =
        RangeJoinOptimization +: spark.experimental.extraOptimizations
  }

  /** Band-join `left` with `right`: every (l, r) pair with equal keys
    * and `rOrd - lOrd ∈ [lower, upper)`, offsets in the order
    * column's native unit (µs for timestamps, days for dates). Inner
    * semantics — NULL keys and NULL order values never match. Column
    * names resolve case-sensitively per side; rename the right side
    * first when names collide (as with any self-join). */
  def joinRange(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftOrd: String, rightOrd: String,
      lower: Long, upper: Long): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = org.apache.spark.sql.graft.Bridge.analyzedPlan(left)
    val rPlan = org.apache.spark.sql.graft.Bridge.analyzedPlan(right)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      RangeJoin(lPlan, rPlan,
        leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
        resolve(lPlan, leftOrd), resolve(rPlan, rightOrd), lower, upper))
  }
}
