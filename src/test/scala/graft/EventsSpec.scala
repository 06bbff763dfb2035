package graft

import graft.ops.{Events, Util}
import org.apache.spark.sql.functions._

/** Conservation invariants for the event-sequence analytics (the
  * oracle pins exact values; these pin the laws that must hold on ANY
  * event log). */
class EventsSpec extends SparkTestBase {

  test("path transitions conserve steps: sum(n) = events - users (J13)") {
    val ev = Util.t(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    val total = Events.pathTransitions(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    // each user with k events contributes exactly k-1 consecutive steps
    assert(total == nEvents - nUsers)
  }

  test("path transition shares sum to 1 per source type (J13)") {
    val bad = Events.pathTransitions(spark, sfDir)
      .groupBy(col("from_type")).agg(sum(col("share")).as("s"))
      .collect().filter(r => math.abs(r.getDouble(1) - 1.0) > 1e-4)
    // each share is exact-decimal truncated at 6dp; ≤5 terms per type
    assert(bad.isEmpty, bad.mkString(", "))
  }
}
