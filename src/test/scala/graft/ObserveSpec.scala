package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** A21 observed-scan laws: the CollectMetrics side channel must report
  * exactly what a direct aggregation over the SAME (pre-filter) frame
  * reports, and the observation must not perturb the query result. */
class ObserveSpec extends SparkTestBase {

  test("A21: observation metrics equal direct aggregates over the scanned frame") {
    val obs = new Observation("scan_qc_test")
    val df = graft.ops.Scans.observedOrders(spark, sfDir, Some(obs))
    val got = df.collect()
    val m = obs.get
    val o = graft.ops.Util.t(spark, sfDir, "orders")
    val direct = o.agg(count(lit(1)),
      sum(org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
        .cast("long")),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))).head
    // metrics profile EVERYTHING scanned, not just the filtered output
    assert(m("n_rows") == direct.getLong(0))
    assert(m("cents_sum") == direct.getLong(1))
    assert(m("n_null_status") == direct.getLong(2))
    assert(got.length < direct.getLong(0),
      "the filter really drops rows — metrics are pre-filter by construction")
    // transparency: observed result == the same query without observe
    val plain = o
      .select(col("o_orderkey"), col("o_orderstatus"),
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long").as("tp_cents"))
      .filter(col("o_orderstatus") === "F").orderBy(col("o_orderkey"))
      .limit(500).collect()
    assert(got.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("the global-sort double-count gotcha is real (why A21 uses TakeOrdered)") {
    val obs = new Observation("scan_qc_doubled")
    val o = graft.ops.Util.t(spark, sfDir, "orders")
    val n = o.count()
    // same observation placed under a global SORT: the range-sampling
    // job executes the metrics subtree a second time
    o.observe(obs, count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderkey")).collect()
    assert(obs.get("n_rows").asInstanceOf[Long] > n,
      "a global sort's sampling pass inflates observed metrics — the " +
        "documented reason observedOrders ends in orderBy().limit()")
  }
}
