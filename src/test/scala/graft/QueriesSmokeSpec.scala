package graft

/** Executes every registered query end-to-end at sf0.001 — catches
  * runtime plan errors the type-checker can't, and pins the
  * queries↔oracle registration contract. */
class QueriesSmokeSpec extends SparkTestBase {

  // ops whose correct fixture answer is legitimately empty at tiny scale
  private val mayBeEmpty = Set(
    "join_anti", "set_except", "join_range_interval",
    "dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash", "dedup_clusters",
    "dedup_containment", "sim_ann_topk", "sim_ivf_topk")

  test("every oracleSql key is a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle SQL without a query: $unknown")
  }

  test("rows-only queries are exactly the documented non-portable set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("agg_approx_distinct", "agg_approx_percentile",
      "agg_heavy_hitters", "agg_sketch_union", "agg_sketch_theta",
      "agg_sketch_persist", "agg_sketch_kll",
      "dedup_minhash",
      "dedup_simhash", "dedup_embedding", "dedup_semantic",
      "sim_ann_topk", "sim_ivf_topk", "sim_pq_topk", "sim_ivfpq_topk",
      "sim_nsw_topk", "sim_hnsw_topk", "sim_hnsw_batch_topk",
      "sim_hnsw_incremental",
      "contamination_embedding"))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
