package graft

import graft.ops.LlmData

/** Policy tests for the LLM-data ops that the oracle fixture cannot
  * exercise (its columns are never NULL). */
class LlmDataSpec extends SparkTestBase {

  test("contamination screen includes NULL-source documents (K23)") {
    import spark.implicits._
    // round-6 verdict #5: `source =!= 'src0'` is NULL-unsafe, so a
    // NULL-source document sharing benchmark shingles silently escaped
    // screening. NULL source must be treated as a candidate.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "src0"),
      (1L, "alpha beta gamma delta zeta", "src1"),
      (2L, "alpha beta gamma delta eta", null)
    ).toDF("doc_id", "text", "source")
    val hits = LlmData.contaminationScreen(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // both non-benchmark docs share the trigrams "alpha beta gamma"
    // and "beta gamma delta" with the src0 doc
    assert(hits == Map(1L -> 2L, 2L -> 2L))
  }

  test("dedup_substring counts duplicated 16-token spans exactly (K32)") {
    import spark.implicits._
    val a = (0 until 20).map(i => s"a$i")
    val docs = Seq(
      (0L, a.mkString(" ")),                                  // 5 spans
      (1L, a.mkString(" ")),                                  // exact dup of 0
      (2L, (a.drop(4) ++ Seq("c0", "c1", "c2", "c3")).mkString(" ")),
      // ^ span at pos 0 = a4..a19 = doc 0's span at pos 4 — 1 of 5 dup
      (3L, a.take(10).mkString(" "))                          // below window
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_k32_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmData.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.toString))))
      .toMap
    assert(got(0L) == ((5L, 5L, Some("1.0"))))
    assert(got(1L) == ((5L, 5L, Some("1.0"))))
    assert(got(2L) == ((5L, 1L, Some("0.2"))))
    assert(got(3L) == ((0L, 0L, None)))
  }

  test("corpus_shard conserves docs and token mass across shards (K31)") {
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    val nDocs = docs.count()
    val nToks = docs.selectExpr("CAST(size(split(text, ' ')) AS LONG) t")
      .agg(org.apache.spark.sql.functions.sum("t")).collect()(0).getLong(0)
    val rows = LlmData.corpusShard(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    assert(rows.map(_.getLong(2)).sum == nToks)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
  }
}
