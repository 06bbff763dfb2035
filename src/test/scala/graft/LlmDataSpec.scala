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
}
