package graft

import org.apache.spark.sql.functions._
import graft.ops.AnnLsh

/** Sign-hyperplane LSH: planted near-identical vectors must collide in
  * every table and surface through both the near-dup and the ANN path. */
class AnnLshSpec extends SparkTestBase {

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private def randomVecs(n: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(AnnLsh.Dim)(rnd.nextGaussian().toFloat))
  }

  test("identical vectors collide in every table and verify at cosine 1") {
    val v = randomVecs(1, 11).head
    val noise = randomVecs(20, 12)
    val df = vecsDf(Seq(1L -> v, 2L -> v) ++
      noise.zipWithIndex.map { case (x, i) => (10L + i) -> x })
    val pairs = AnnLsh.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(pairs.forall(_._3 >= 0.99))
  }

  test("a tiny perturbation still pairs at cosine >= 0.99") {
    val v = randomVecs(1, 21).head
    val nearDup = v.updated(0, v.head + 0.01f)
    val noise = randomVecs(20, 22)
    val df = vecsDf(Seq(1L -> v, 2L -> nearDup) ++
      noise.zipWithIndex.map { case (x, i) => (10L + i) -> x })
    val pairs = AnnLsh.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("annTopK surfaces a planted near-duplicate of the query as hit #1") {
    val q = randomVecs(1, 31).head
    val nearDup = q.map(x => x * 1.001f)
    val noise = randomVecs(50, 32)
    val df = vecsDf(Seq(0L -> q, 1L -> nearDup) ++
      noise.zipWithIndex.map { case (x, i) => (10L + i) -> x })
    val top = AnnLsh.annTopK(df, "vec_id", "embedding", 0L, 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 1L, "scaled copy must be the top hit")
    assert(top.head.getDouble(1) == 1.0)
  }

  test("codes are deterministic across runs") {
    val df = vecsDf(randomVecs(5, 41).zipWithIndex.map { case (v, i) => i.toLong -> v })
    val a = AnnLsh.codes(df, "vec_id", "embedding")
      .orderBy("vec_id", "table_id").collect().map(_.toSeq).toSeq
    val b = AnnLsh.codes(df, "vec_id", "embedding")
      .orderBy("vec_id", "table_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("topNearDupPairs ranks a planted duplicate pair first") {
    val v = randomVecs(1, 51).head
    val noise = randomVecs(20, 52)
    val df = vecsDf(Seq(1L -> v, 2L -> v) ++
      noise.zipWithIndex.map { case (x, i) => (10L + i) -> x })
    val top = AnnLsh.topNearDupPairs(df, "vec_id", "embedding", 5).collect()
    assert(top.nonEmpty)
    assert((top.head.getLong(0), top.head.getLong(1)) == ((1L, 2L)))
    assert(top.head.getDouble(2) == 1.0)
    val scores = top.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)), "must be cos-descending")
  }

  test("dedup_embedding query is non-empty and deterministic on the fixture") {
    val out = ops.LlmData.dedupEmbedding(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty && out.length <= 10,
      "top-N probe must be non-vacuous on the fixture (round-4 verdict)")
    assert(out.forall(p => p._1 < p._2))
    val again = ops.LlmData.dedupEmbedding(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("sim_ann_topk query executes and scores are valid cosines") {
    val out = ops.LlmData.simAnnTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.forall(p => p._2 >= -1.0 && p._2 <= 1.0))
    assert(out.forall(_._1 != 0L))
  }
}
