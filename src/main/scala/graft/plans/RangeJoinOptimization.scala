package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for the custom [[RangeJoin]] logical operator —
  * the band-join counterpart of [[AsOfJoinOptimization]].
  *
  * Catalyst's own pushdown rules (`PushPredicateThroughJoin`,
  * `ColumnPruning`) pattern-match on built-in nodes only, so without
  * this rule a `Filter`/`Project` written above a native band join
  * stops dead at the custom node: the predicate is evaluated on every
  * JOINED row post-merge and both parquet scans read every column. At
  * 100 TB that turns a pruned two-column scan of one day's partition
  * into a full-corpus scan feeding a wider-than-needed exchange.
  *
  * Two rewrites, both safe because [[RangeJoin]] is a pure INNER join
  * (every output row is a (left, right) pair that satisfied the key
  * equality and the band — there are no NULL-extended rows and no
  * "pick one match" semantics for a filter to perturb):
  *
  *  - '''Predicate pushdown (both sides).''' A deterministic conjunct
  *    referencing only one side's attributes commutes with an inner
  *    join — dropping a left (right) row before the join removes
  *    exactly the output pairs that row participates in, the same
  *    pairs the filter would drop above. Unlike the as-of rule, the
  *    RIGHT side pushes too: a band join matches ALL in-band rows,
  *    not "the latest prior", so pre-filtering the right side cannot
  *    re-match a different row. Conjuncts spanning both sides stay
  *    above.
  *  - '''Column pruning.''' A `Project` above the join that does not
  *    use every join output narrows both children to the referenced
  *    attributes plus the join's own key/order references; standard
  *    `ColumnPruning` then drives the narrowed sets into the scans'
  *    `ReadSchema`.
  *
  * Injected via `graft.GraftExtensions` (production) and
  * [[RangeJoins.ensureStrategy]] (programmatic path), so strategy and
  * rule always arrive together. Pinned by `RangeJoinPushdownSpec` —
  * scan-level `PushedFilters` / `ReadSchema` assertions plus
  * row-for-row equality against manually pre-pushed shapes.
  */
object RangeJoinOptimization extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {

    case f @ Filter(cond, j: RangeJoin) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sideOnly(p: Expression, side: LogicalPlan): Boolean =
        p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(side.outputSet)
      val (lPush, rest) = conjuncts.partition(sideOnly(_, j.left))
      val (rPush, keep) = rest.partition(sideOnly(_, j.right))
      if (lPush.isEmpty && rPush.isEmpty) f
      else {
        val newLeft =
          lPush.reduceOption(And).map(Filter(_, j.left)).getOrElse(j.left)
        val newRight =
          rPush.reduceOption(And).map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(_, j: RangeJoin) if prunedChildren(p, j).isDefined =>
      val (newLeft, newRight) = prunedChildren(p, j).get
      p.copy(child = j.copy(left = newLeft, right = newRight))
  }

  /** The join's children narrowed to what `p` + the join itself need;
    * None when nothing narrows (keeps the rule fixed-point stable). */
  private def prunedChildren(
      p: Project, j: RangeJoin): Option[(LogicalPlan, LogicalPlan)] = {
    val required = AttributeSet(p.projectList.flatMap(_.references)) ++
      AttributeSet((j.leftKeys ++ j.rightKeys :+ j.leftOrd :+ j.rightOrd)
        .flatMap(_.references))
    def prune(child: LogicalPlan): Option[LogicalPlan] =
      if (child.output.forall(required.contains)) None
      else Some(Project(child.output.filter(required.contains), child))
    (prune(j.left), prune(j.right)) match {
      case (None, None) => None
      case (l, r) => Some((l.getOrElse(j.left), r.getOrElse(j.right)))
    }
  }
}
