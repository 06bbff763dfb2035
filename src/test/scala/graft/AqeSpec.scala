package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution — the runtime re-planning the engine
  * relies on at 100 TB (SURVEY §4.2): a skewed join partition is split
  * at execution time (the zero-code complement to the explicit D10
  * salting pattern), and undersized shuffle outputs are coalesced so a
  * 32-partition config doesn't mean 32 tasks over 10 rows. The final
  * adaptive plan is only available AFTER the Dataset itself executes —
  * plan assertions here run against the executed query. */
class AqeSpec extends SparkTestBase {

  private val tuning = Seq(
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withTuning[A](body: => A): A = {
    val prev = tuning.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuning.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    withTuning {
      import spark.implicits._
      val left = ((1 to 300000).map(_ => (1L, "x")) ++
        (2L to 50L).flatMap(k => (1 to 10).map(_ => (k, "y")))).toDF("k", "v")
      val right = (1L to 50L).map(k => (k, k * 10)).toDF("k", "w")
      val j = left.join(right, Seq("k"))
      assert(j.collect().length == 300490)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "adaptive plan must finalize")
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"skewed partition must be split:\n$plan")
    }
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // the runtime row-level filter that makes selective fact⋈filtered-dim
    // joins scan-light at 100 TB: the filtered side's keys build a bloom
    // filter applied to the big side BEFORE its shuffle. Fixture tables
    // sit below the production thresholds, so the test lowers them —
    // asserting the capability stays wired, not the default tuning.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = ops.Util.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = ops.Util.t(spark, sfDir, "lineitem")
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(j.collect().length == 1)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain("),
        s"fact side must carry the runtime bloom filter:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"filtered dim side must build the bloom filter:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    withTuning {
      import spark.implicits._
      val agg = (1 to 1000).map(i => (i % 10, i)).toDF("k", "v")
        .groupBy("k").agg(sum("v"))
      assert(agg.collect().length == 10)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"10-group shuffle must coalesce below ${spark.conf.get(
          "spark.sql.shuffle.partitions")} partitions:\n$plan")
    }
  }
}
