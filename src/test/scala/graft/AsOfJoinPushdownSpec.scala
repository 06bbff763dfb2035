package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoin}
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** The [[graft.plans.AsOfJoinOptimization]] optimizer rule: Catalyst's
  * built-in pushdown rules treat the custom AsOfJoin node as opaque,
  * so this rule is what carries filters and column pruning through it
  * into the parquet scans. Assertions are at the SCAN level
  * (`PushedFilters`, `ReadSchema`) — the thing that actually matters
  * at 100 TB — plus row-for-row result equality against manually
  * pre-pushed shapes. */
class AsOfJoinPushdownSpec extends SparkTestBase {

  // events carries parquet TIMESTAMP(NANOS) — must go through Util.t
  private def events = graft.ops.Util.t(spark, sfDir, "events")

  /** Full-width as-of self-join: purchases probe all prior events. */
  private def asof(left: DataFrame = events, right: DataFrame = events): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    AsOf.joinAsOf(left, r, Seq("user_id"), Seq("r_user_id"),
      Seq("ts", "event_id"), Seq("r_ts", "r_event_id"))
  }

  test("left-only filter pushes below the join and into the scan") {
    val df = asof().filter(col("user_id") < 50 && col("event_type") === "purchase")
    val joins = df.queryExecution.optimizedPlan.collect { case j: AsOfJoin => j }
    assert(joins.size == 1)
    // the conjuncts landed below the join…
    assert(joins.head.left.collect { case f: Filter => f }.nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    // …and continued into the parquet scan as data filters
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(user_id,50)"), physical)
    assert(physical.contains("EqualTo(event_type,purchase)"), physical)
    // equality against the manually pre-filtered shape
    val manual = asof(left = events
      .filter(col("user_id") < 50 && col("event_type") === "purchase"))
    assert(df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect().toSeq ==
      manual.orderBy(manual.columns.map(col).toIndexedSeq: _*).collect().toSeq)
  }

  test("right-side filter must NOT push (latest-prior semantics)") {
    // value > 0 on the MATCHED row: pushing it below would re-match an
    // earlier event instead of returning the true latest-prior row
    val df = asof().filter(col("r_value") > 0)
    val joins = df.queryExecution.optimizedPlan.collect { case j: AsOfJoin => j }
    assert(joins.size == 1)
    assert(joins.head.right.collect { case f: Filter => f }.isEmpty,
      df.queryExecution.optimizedPlan.toString)
    // and it keeps filtering ABOVE: rows whose matched event has
    // value <= 0 are dropped, not re-matched
    val full = asof().collect()
    val i = full.head.schema.fieldIndex("r_value")
    val expected = full.filter(r => !r.isNullAt(i) && r.getDouble(i) > 0).toSet
    assert(df.collect().toSet == expected)
  }

  test("mixed conjuncts split: left side pushes, right side stays") {
    val df = asof().filter(col("user_id") < 50 && col("r_value") > 0)
    val j = df.queryExecution.optimizedPlan.collect { case j: AsOfJoin => j }.head
    assert(j.left.collect { case f: Filter => f }.nonEmpty)
    assert(j.right.collect { case f: Filter => f }.isEmpty)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(user_id,50)"), physical)
  }

  test("column pruning narrows both scans' ReadSchema") {
    val narrow = asof().select("event_id", "r_event_id")
    val physical = narrow.queryExecution.executedPlan.toString
    // neither scan may read the untouched wide columns ("value" is
    // skipped: the bare word appears in unrelated plan text)
    for (dead <- Seq("props", "event_type"))
      assert(!physical.contains(dead), s"$dead leaked into: $physical")
    // positive control: without the projection the scans ARE wide
    val wide = asof().queryExecution.executedPlan.toString
    assert(wide.contains("props"), wide)
    // and the narrowed plan still answers correctly
    val got = narrow.collect()
    val full = asof().select("event_id", "r_event_id").collect()
    assert(got.toSeq.sortBy(_.toString) == full.toSeq.sortBy(_.toString))
    assert(got.nonEmpty)
  }
}
