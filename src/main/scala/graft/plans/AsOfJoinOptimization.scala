package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for the custom [[AsOfJoin]] logical operator —
  * the `Rule[LogicalPlan]` rung of the Catalyst extension ladder
  * (expressions → generators → aggregators → DSv2 source → logical
  * plan + strategy → THIS).
  *
  * Catalyst's own pushdown rules (`PushPredicateThroughJoin`,
  * `ColumnPruning`) pattern-match on built-in nodes only; a custom
  * LogicalPlan is opaque to them, so without this rule a
  * `Filter`/`Project` above an as-of join stops dead at the join and
  * the parquet scans below read every row of every column. At 100 TB
  * that is the difference between scanning a day's partition of two
  * columns and scanning the whole corpus.
  *
  * Two rewrites, both safe by the operator's semantics (each left row
  * produces exactly one output row whose left-side values are
  * unchanged; right-side values only ever come from the matched row):
  *
  *  - '''Predicate pushdown (left side only).''' A deterministic
  *    conjunct referencing only left-side attributes commutes with the
  *    join, so it moves below — and from there Spark's standard rules
  *    carry it into the scan (`PushedFilters`). Right-side conjuncts
  *    must NOT move: the join is left-outer (a right-side predicate
  *    above the join also filters NULL-matched rows) and, more
  *    fundamentally, filtering the right side BEFORE the join changes
  *    which row is "the latest prior" (a predicate that kills the
  *    match should yield NULL, not fall back to an earlier event).
  *  - '''Column pruning.''' A `Project` above the join that does not
  *    use every join output narrows both children to the referenced
  *    attributes plus the join's own key/order references; standard
  *    `ColumnPruning` then drives the narrowed sets into the scans'
  *    `ReadSchema`.
  *
  * Injected via `graft.GraftExtensions` (production) and
  * `AsOf.ensureStrategy` (programmatic path), so both arrive together.
  * Pinned by `AsOfJoinPushdownSpec` — scan-level `PushedFilters` and
  * `ReadSchema` assertions plus row-for-row result equality against
  * the unoptimized shape.
  */
object AsOfJoinOptimization extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {

    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(_, j: AsOfJoin) if prunedChildren(p, j).isDefined =>
      val (newLeft, newRight) = prunedChildren(p, j).get
      p.copy(child = j.copy(left = newLeft, right = newRight))
  }

  /** The join's children narrowed to what `p` + the join itself need;
    * None when nothing narrows (keeps the rule fixed-point stable). */
  private def prunedChildren(
      p: Project, j: AsOfJoin): Option[(LogicalPlan, LogicalPlan)] = {
    val required = AttributeSet(p.projectList.flatMap(_.references)) ++
      AttributeSet((j.leftKeys ++ j.rightKeys ++ j.leftOrder ++ j.rightOrder)
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
