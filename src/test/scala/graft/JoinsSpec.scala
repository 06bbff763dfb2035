package graft

/** C46 (bloom-prefiltered semi-join) laws. */
class JoinsSpec extends SparkTestBase {

  test("C46: bloom prefilter + exact join ≡ plain semi-join (no false negatives)") {
    val on  = ops.Joins.joinBloomSemiCore(spark, sfDir, bloomPrefilter = true)
      .collect().toSeq
    val off = ops.Joins.joinBloomSemiCore(spark, sfDir, bloomPrefilter = false)
      .collect().toSeq
    assert(on == off,
      "the bloom probe may only cut bytes moved, never rows returned")
  }

  test("C46: the registered form returns every flag with positive counts") {
    val rows = ops.Joins.joinBloomSemi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0L), "each flag group is non-empty")
  }

  test("C47: window-form theta aggregate ≡ aggregating the C8 pair set") {
    import org.apache.spark.sql.functions._
    // the law: the O(n log n) windowed form answers exactly the same
    // question as grouping the materialized quadratic pair relation
    val pairForm = ops.Joins.joinTheta(spark, sfDir)
      .withColumn("gap", col("s_acctbal") - col("c_acctbal"))
      .join(
        spark.read.parquet(s"$sfDir/supplier.parquet")
          .select(col("s_suppkey"), col("s_nationkey")),
        Seq("s_suppkey"))
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"))
      .orderBy(col("n_name"))
      .collect().toSeq
    val winForm = ops.Joins.joinThetaAgg(spark, sfDir).collect().toSeq
    assert(winForm == pairForm,
      "window pair-census must equal the materialized-pair aggregate")
  }
}
