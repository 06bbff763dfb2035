package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{RangeJoin, RangeJoins}
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** The [[graft.plans.RangeJoinOptimization]] optimizer rule: Catalyst's
  * built-in pushdown rules treat the custom RangeJoin node as opaque,
  * so this rule is what carries filters and column pruning through it
  * into the parquet scans. Assertions are at the SCAN level
  * (`PushedFilters`, `ReadSchema`) — the thing that actually matters
  * at 100 TB — plus row-for-row result equality against manually
  * pre-pushed shapes. Unlike the as-of rule (left-outer, latest-prior
  * semantics), the band join is a pure inner join, so BOTH sides'
  * single-side conjuncts must push. */
class RangeJoinPushdownSpec extends SparkTestBase {

  // events carries parquet TIMESTAMP(NANOS) — must go through Util.t
  private def events = graft.ops.Util.t(spark, sfDir, "events")
  private def rEvents =
    events.columns.foldLeft(events)((d, c) => d.withColumnRenamed(c, s"r_$c"))

  /** Full-width band self-join: every event paired with the same
    * user's events in the 5 minutes after it. */
  private def band(left: DataFrame = events,
      right: DataFrame = rEvents): DataFrame =
    RangeJoins.joinRange(left, right, Seq("user_id"), Seq("r_user_id"),
      "ts", "r_ts", lower = 0L, upper = 5L * 60 * 1000000)

  private def sortedRows(df: DataFrame) =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect().toSeq

  test("left-only filter pushes below the join and into the scan") {
    val df = band().filter(col("user_id") < 50 && col("event_type") === "purchase")
    val joins = df.queryExecution.optimizedPlan.collect { case j: RangeJoin => j }
    assert(joins.size == 1)
    // the conjuncts landed below the join…
    assert(joins.head.left.collect { case f: Filter => f }.nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    // …and continued into the parquet scan as data filters
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(user_id,50)"), physical)
    assert(physical.contains("EqualTo(event_type,purchase)"), physical)
    val manual = band(left = events
      .filter(col("user_id") < 50 && col("event_type") === "purchase"))
    assert(sortedRows(df) == sortedRows(manual))
    assert(df.count() > 0)
  }

  test("right-side filter pushes too (inner-join semantics)") {
    val df = band().filter(col("r_event_type") === "click")
    val joins = df.queryExecution.optimizedPlan.collect { case j: RangeJoin => j }
    assert(joins.size == 1)
    assert(joins.head.right.collect { case f: Filter => f }.nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    // pushdown rewrites through the r_ rename back to the scan column
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("EqualTo(event_type,click)"), physical)
    val manual = band(right = rEvents.filter(col("r_event_type") === "click"))
    assert(sortedRows(df) == sortedRows(manual))
    assert(df.count() > 0)
  }

  test("cross-side conjunct stays above the join") {
    val df = band().filter(col("value") > col("r_value"))
    val j = df.queryExecution.optimizedPlan.collect { case j: RangeJoin => j }.head
    // Catalyst infers isnotnull(value)/isnotnull(r_value) from the
    // comparison and the rule rightly pushes those single-side
    // conjuncts — but the cross-side comparison itself must stay above
    def hasComparison(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case f: Filter => f }.exists(
        _.condition.toString.contains(">"))
    assert(!hasComparison(j.left), j.left.toString)
    assert(!hasComparison(j.right), j.right.toString)
    // and it still filters: strictly fewer rows than the raw join
    assert(df.count() < band().count())
  }

  test("column pruning narrows both scans' ReadSchema") {
    val narrow = band().select("event_id", "r_event_id")
    val physical = narrow.queryExecution.executedPlan.toString
    // neither scan may read the untouched wide columns ("value" is
    // skipped: the bare word appears in unrelated plan text)
    for (dead <- Seq("props", "event_type"))
      assert(!physical.contains(dead), s"$dead leaked into: $physical")
    // positive control: without the projection the scans ARE wide
    val wide = band().queryExecution.executedPlan.toString
    assert(wide.contains("props"), wide)
    // and the narrowed plan still answers correctly
    val got = narrow.collect()
    val full = band().select("event_id", "r_event_id").collect()
    assert(got.toSeq.sortBy(_.toString) == full.toSeq.sortBy(_.toString))
    assert(got.nonEmpty)
  }
}
