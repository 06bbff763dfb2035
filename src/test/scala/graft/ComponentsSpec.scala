package graft

import graft.ops.Components

/** Connected-component dedup clustering: transitivity (A~B, B~C ⇒ one
  * cluster), min-id canonical labels, convergence on long chains. */
class ComponentsSpec extends SparkTestBase {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  private def clustersOf(es: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connected(edgesDf(es), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive closure: chain and separate pair") {
    val c = clustersOf(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("a long path converges to one component (diameter > 1 round)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val c = clustersOf(chain)
    assert(c.values.toSet == Set(0L))
    assert(c.keySet == (0L to 9L).toSet)
  }

  test("min id wins regardless of edge orientation") {
    val c = clustersOf(Seq((9L, 4L), (4L, 7L)))
    assert(c == Map(4L -> 4L, 7L -> 4L, 9L -> 4L))
  }

  test("dedup_clusters marks exactly one canonical doc per cluster") {
    val rows = ops.LlmData.dedupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // sf0.001 may have no near-dup pairs at all; the semantics checks
    // below are vacuous-safe, the non-empty case is pinned at sf0.01 by
    // the driver's oracle row
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3) == 1, s"cluster $cid canonical count")
      assert(members.map(_._1).min == cid, s"cluster $cid min-id label")
      assert(members.find(_._3).get._1 == cid)
    }
  }

  test("text_tokens_bpe counts more tokens than whitespace on punctuated text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "Hello world, 42 times!"))
      .toDF("doc_id", "text")
      .select(size(split(col("text"), " ")).as("n_ws"),
        size(regexp_extract_all(col("text"),
          lit(ops.LlmData.BpeTokenPattern), lit(0))).as("n_bpe"))
      .head()
    assert(df.getInt(0) == 4)
    assert(df.getInt(1) == 6) // Hello / world / , / 42 / times / !
  }
}
