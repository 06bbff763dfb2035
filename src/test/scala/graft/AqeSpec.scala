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

  test("a filtered dim prunes the partitioned fact's partitions at runtime (DPP)") {
    // dynamic partition pruning — the partition-level complement of the
    // bloom filter's row-level pruning: the dim side's filter result
    // decides WHICH fact partitions are read at all. At 100 TB a
    // date/region-partitioned fact joined to a filtered dim must scan
    // only the surviving partitions; losing DPP is a full-table scan.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    ops.Util.t(spark, sfDir, "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // dim: priority attributes, parquet-backed like a real dim table —
    // a LocalRelation dim folds its filter away, and the predicate must
    // be a likely-selective SHAPE (equality/IN — a bare boolean
    // attribute is not) for the pruning rule to act on it
    Seq(("1-URGENT", "urgent"), ("2-HIGH", "high"), ("3-MEDIUM", "mid"),
      ("4-NOT SPECIFIED", "none"), ("5-LOW", "low"))
      .toDF("prio", "tier")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val j = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .filter(col("tier") === "urgent")
      .groupBy(col("prio")).agg(count(lit(1)).as("n"))
    assert(j.collect().length == 1)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning filter:\n$plan")
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
