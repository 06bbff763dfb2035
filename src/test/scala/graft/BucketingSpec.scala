package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the layout that
  * removes the shuffle from repeated large-table equi-joins at
  * warehouse scale. Both sides are written bucketed on the join key;
  * the join must then plan with NO exchange above either scan. */
class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    (1L to 10000L).map(i => (i, s"a$i")).toDF("k", "va")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    (1L to 10000L).map(i => (i, i * 2)).toDF("k", "vb")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE graft_bkt_a")
      spark.sql("DROP TABLE graft_bkt_b")
    }
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bkt_c")
    (1L to 5000L).map(i => (i % 100, i)).toDF("k", "v")
      .write.bucketBy(8, "k").saveAsTable("graft_bkt_c")
    try {
      val agged = spark.table("graft_bkt_c").groupBy("k").agg(sum("v"))
      val plan = agged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle:\n$plan")
      assert(agged.count() == 100L)
    } finally {
      spark.sql("DROP TABLE graft_bkt_c")
    }
  }
}
