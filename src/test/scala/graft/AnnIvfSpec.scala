package graft

import graft.ops.AnnIvf

/** IVF ANN: the trained coarse quantizer must route a planted
  * duplicate of the query into a probed cell and rank it first. */
class AnnIvfSpec extends SparkTestBase {

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private def randomVecs(n: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(64)(rnd.nextGaussian().toFloat))
  }

  test("a planted scaled copy of the query is hit #1 with cosine 1") {
    val q = randomVecs(1, 51).head
    val copy = q.map(_ * 1.0005f)
    val noise = randomVecs(80, 52)
    val df = vecsDf(Seq(0L -> q, 1L -> copy) ++
      noise.zipWithIndex.map { case (v, i) => (10L + i) -> v })
    val top = AnnIvf.ivfTopK(df, "vec_id", "embedding", 0L, 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 1L)
    assert(top.head.getDouble(1) == 1.0)
  }

  test("probing 2 of 16 cells returns a bounded candidate set with valid scores") {
    val vs = randomVecs(100, 61)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val top = AnnIvf.ivfTopK(df, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length <= 5)
    assert(top.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    assert(top.forall(_.getLong(0) != 0L))
  }

  test("a saved+loaded codebook answers queries identically (offline index build)") {
    val vs = randomVecs(60, 77)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val fitted = AnnIvf.codebook(df, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    AnnIvf.saveCodebook(fitted, s"$dir/codebook")
    val loaded = AnnIvf.loadCodebook(s"$dir/codebook")
    val a = AnnIvf.ivfTopK(df, "vec_id", "embedding", 0L, 5, fitted).collect().toSeq
    val b = AnnIvf.ivfTopK(df, "vec_id", "embedding", 0L, 5, loaded).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sim_ivf_topk query executes on the fixture corpus") {
    val out = ops.LlmData.simIvfTopk(spark, sfDir).collect()
    assert(out.length <= 5)
    assert(out.forall(_.getLong(0) != 0L))
  }
}
