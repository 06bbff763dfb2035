package graft

import graft.ops.LlmData

/** Shared pair-set materialization (round-8 verdict task 3): the
  * production dedup chain computes the K6 pair relation once, persists
  * it, and serves every composition from the store. Each `*FromPairs`
  * variant must be row-identical to its self-contained registered
  * query, and the amortized chain must not silently diverge from the
  * per-query plans the oracle checks. */
class MaterializedPairsSpec extends SparkTestBase {

  private lazy val pairsDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pairs_").toString
    LlmData.materializePairs(spark, sfDir, d)
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("materialized pairs equal the inline K6 pair relation") {
    val stored = rows(LlmData.pairsFrom(spark, pairsDir)
      .orderBy("doc_a", "doc_b"))
    val inline = rows(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir))
    assert(stored == inline)
  }

  test("dedup_clusters from the store equals the self-contained query") {
    val shared = rows(LlmData.dedupClustersFromPairs(
      LlmData.pairsFrom(spark, pairsDir)))
    assert(shared == rows(SparkEntry.queries("dedup_clusters")(spark, sfDir)))
  }

  test("dedup_keep_best from the store equals the self-contained query") {
    val shared = rows(LlmData.dedupKeepBestFromPairs(spark, sfDir,
      LlmData.pairsFrom(spark, pairsDir)))
    assert(shared == rows(SparkEntry.queries("dedup_keep_best")(spark, sfDir)))
  }

  test("dedup_source_overlap from the store equals the self-contained query") {
    val shared = rows(LlmData.dedupSourceOverlapFromPairs(spark, sfDir,
      LlmData.pairsFrom(spark, pairsDir)))
    assert(shared == rows(SparkEntry.queries("dedup_source_overlap")(spark, sfDir)))
  }

  test("dedup_end_to_end from the store equals the self-contained query") {
    val shared = rows(LlmData.dedupEndToEndFromPairs(spark, sfDir,
      LlmData.pairsFrom(spark, pairsDir)))
    assert(shared == rows(SparkEntry.queries("dedup_end_to_end")(spark, sfDir)))
  }

  test("ensurePairs serves the marker-committed per-fixture cache") {
    val got = rows(LlmData.ensurePairs(spark, sfDir).orderBy("doc_a", "doc_b"))
    // the cache content IS the pipeline output: identical to a fresh
    // materialization of the same deterministic relation
    assert(got == rows(LlmData.pairsFrom(spark, pairsDir)
      .orderBy("doc_a", "doc_b")))
    assert(new java.io.File(LlmData.pairsCacheDir(sfDir),
      "_GRAFT_PAIRS_READY").exists,
      "marker must be committed after the build")
    // a second call reads the store (same rows, no rebuild)
    assert(got == rows(LlmData.ensurePairs(spark, sfDir)
      .orderBy("doc_a", "doc_b")))
  }

  test("the shared chain amortizes the pair pipeline (timing note)") {
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, selfContained) = time {
      SparkEntry.queries("dedup_clusters")(spark, sfDir).count()
      SparkEntry.queries("dedup_keep_best")(spark, sfDir).count()
      SparkEntry.queries("dedup_end_to_end")(spark, sfDir).count()
      SparkEntry.queries("dedup_source_overlap")(spark, sfDir).count()
    }
    val (_, shared) = time {
      val p = LlmData.pairsFrom(spark, pairsDir)
      LlmData.dedupClustersFromPairs(p).count()
      LlmData.dedupKeepBestFromPairs(spark, sfDir, p).count()
      LlmData.dedupEndToEndFromPairs(spark, sfDir, p).count()
      LlmData.dedupSourceOverlapFromPairs(spark, sfDir, p).count()
    }
    // no assertion on wall clock (fixture-scale noise) — recorded for
    // the bench notes; the structural claim is covered by the equality
    // tests above
    info(f"self-contained 4-query chain: $selfContained%.2f s; " +
      f"shared-pairs chain: $shared%.2f s")
  }
}
