package graft

import org.apache.spark.sql.functions._
import graft.ops.AnnPq

/** PQ ANN laws: code well-formedness, the self-minimum theorem (the
  * query's own codes achieve the global ADC minimum, so an exact
  * duplicate must rank first), ADC expression/driver consistency,
  * planted near-neighbor ranking, and codebook persistence. */
class AnnPqSpec extends SparkTestBase {

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private def randomVecs(n: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(64)(rnd.nextGaussian().toFloat))
  }

  test("codes are well-formed (M entries in [0, KSub)) and encode is deterministic") {
    val vs = randomVecs(80, 11)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val once = AnnPq.encode(df, "vec_id", "embedding", books)
      .orderBy("vec_id").collect()
    val twice = AnnPq.encode(df, "vec_id", "embedding", books)
      .orderBy("vec_id").collect()
    assert(once.length == 80)
    once.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == AnnPq.M)
      assert(codes.forall(c => c >= 0 && c < AnnPq.KSub))
    }
    assert(once.map(_.getSeq[Int](1)).toSeq == twice.map(_.getSeq[Int](1)).toSeq)
  }

  test("self-minimum: an exact duplicate of the query ranks #1 (shares the argmin codes)") {
    // theorem: ADC(x) = sum_j dt(j)(code_j(x)) is minimized per
    // subspace exactly by code_j(q) = argmin_k ||q_j - c_jk||, so the
    // query's own codes (and any exact copy's, which are identical)
    // attain the global minimum over ALL possible code assignments —
    // no other candidate can score strictly higher
    val q = randomVecs(1, 21).head
    val noise = randomVecs(100, 22)
    val df = vecsDf(Seq(0L -> q, 1L -> q) ++
      noise.zipWithIndex.map { case (v, i) => (10L + i) -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val codes = AnnPq.encode(df, "vec_id", "embedding", books)
    val top = AnnPq.topKFromCodes(codes, "vec_id", q, books, 5,
      excludeId = Some(0L)).collect()
    assert(top.head.getLong(0) == 1L,
      s"exact duplicate not ranked first: ${top.toSeq}")
    // and its score is the maximum of the whole frame (self-minimum)
    val allScores = AnnPq.topKFromCodes(codes, "vec_id", q, books, 200)
      .collect().map(_.getDouble(1))
    assert(top.head.getDouble(1) == allScores.max)
  }

  test("ADC expression equals the driver-side recomputation from the same codes") {
    val vs = randomVecs(40, 31)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val q = vs.head
    val dt = AnnPq.adcTable(q, books)
    val got = AnnPq.encode(df, "vec_id", "embedding", books)
      .select(col("vec_id"), col("codes"),
        AnnPq.adcDistance(col("codes"), dt).as("d"))
      .collect()
    got.foreach { r =>
      val codes = r.getSeq[Int](1)
      val expect = codes.zipWithIndex.map { case (c, j) => dt(j)(c) }.sum
      assert(math.abs(r.getDouble(2) - expect) < 1e-12,
        s"vec ${r.getLong(0)}: ADC ${r.getDouble(2)} != $expect")
    }
  }

  test("planted near-neighbors outrank the random background") {
    val rnd = new scala.util.Random(41)
    val q = randomVecs(1, 42).head
    // tight cluster around q (cos ~0.995) vs independent noise
    val near = (1 to 5).map(i =>
      i.toLong -> q.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    val noise = randomVecs(150, 43)
    val df = vecsDf(Seq(0L -> q) ++ near ++
      noise.zipWithIndex.map { case (v, i) => (100L + i) -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val codes = AnnPq.encode(df, "vec_id", "embedding", books)
    val top = AnnPq.topKFromCodes(codes, "vec_id", q, books, 5,
      excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
    val hits = top.count(id => id >= 1L && id <= 5L)
    assert(hits >= 4, s"only $hits/5 planted neighbors in top-5: $top")
  }

  test("native codegen encode is bit-identical to the expression formulation") {
    // the PqCodes kernel promises the aggregate fold order and the
    // array_position first-minimum tie rule; any drift here silently
    // corrupts every stored code table
    val vs = randomVecs(200, 61) :+ Seq.fill(64)(0f) // include a zero vector
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val expr = AnnPq.encode(df, "vec_id", "embedding", books)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    val native = AnnPq.encodeNative(df, "vec_id", "embedding", books)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(expr.length == native.length && expr.length == vs.length)
    expr.zip(native).foreach { case ((ei, ec), (ni, nc)) =>
      assert(ei == ni && ec == nc, s"vec $ei: expr $ec != native $nc")
    }
  }

  test("native encode NULL semantics: short vector and null element yield NULL codes") {
    import spark.implicits._
    val books = AnnPq.fitCodebooks(
      vecsDf(randomVecs(40, 71).zipWithIndex.map { case (v, i) => i.toLong -> v }),
      "embedding", dim = 64)
    val df = Seq(
      (0L, Some(Seq.fill(64)(Some(1.0f)))),
      (1L, Some(Seq.fill(32)(Some(1.0f)))),            // too short
      (2L, Some(Some(1.0f) +: Seq.fill(63)(Option.empty[Float]))), // null elem
      (3L, Option.empty[Seq[Option[Float]]])           // null vector
    ).toDF("vec_id", "embedding")
    val out = AnnPq.encodeNative(df, "vec_id", "embedding", books)
      .orderBy("vec_id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("codebooks survive a save/load round trip bit-exact") {
    val vs = randomVecs(60, 51)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    AnnPq.saveCodebooks(spark, books, s"$dir/codebook")
    val loaded = AnnPq.loadCodebooks(spark, s"$dir/codebook")
    assert(loaded.length == books.length)
    for (j <- books.indices) {
      assert(loaded(j).length == books(j).length)
      for (k <- books(j).indices)
        assert(loaded(j)(k).toSeq == books(j)(k).toSeq)
    }
  }

  test("IVFPQ mechanics: a planted duplicate survives cell pruning and ADC ranks it #1") {
    // in-memory composition (no cache): coarse-assign, encode, prune
    // to probed cells, ADC-score — the duplicate must land in the
    // query's own probed cell and share its argmin codes
    import graft.ops.AnnIvf
    val q = randomVecs(1, 81).head
    val noise = randomVecs(120, 82)
    val df = vecsDf(Seq(0L -> q, 1L -> q) ++
      noise.zipWithIndex.map { case (v, i) => (10L + i) -> v })
    val model = AnnIvf.codebook(df, "embedding")
    val books = AnnPq.fitCodebooks(df, "embedding", dim = 64)
    val assigned = model.transform(df.withColumn("fv",
      org.apache.spark.ml.functions.array_to_vector(col("embedding"))))
    val pruned = assigned.filter(col("cell").isin(
      AnnIvf.probeCells(q, model): _*))
    val codes = AnnPq.encodeNative(pruned, "vec_id", "embedding", books)
    val top = AnnPq.topKFromCodes(codes, "vec_id", q, books, 5,
      excludeId = Some(0L)).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 1L,
      s"planted duplicate lost through IVFPQ: ${top.toSeq}")
  }

  test("sim_ivfpq_topk executes; inverted-list codes agree with the PQ code table") {
    val out = ops.LlmData.simIvfPqTopk(spark, sfDir).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(0) != 0L))
    // the lists build re-encodes the IVF assigned table with the SAME
    // codebooks the flat PQ index used — every vector's codes must be
    // identical in both artifacts or the two rungs silently diverge
    val df = graft.ops.Util.t(spark, sfDir, "embeddings")
    val dim = df.select(size(col("embedding"))).head().getInt(0)
    val (lists, _, _) = AnnPq.ensureIvfPqIndex(
      spark, df, "vec_id", "embedding", s"$sfDir/embeddings", dim)
    val pqDir = AnnPq.ensureIndex(
      spark, df, "vec_id", "embedding", s"$sfDir/embeddings", dim)
    val mismatch = spark.read.parquet(lists).select(col("vec_id"), col("codes").as("lc"))
      .join(spark.read.parquet(s"$pqDir/codes"), Seq("vec_id"))
      .filter(col("lc") =!= col("codes")).count()
    assert(mismatch == 0L, s"$mismatch vectors code differently in lists vs flat PQ")
    val nLists = spark.read.parquet(lists).count()
    assert(nLists == df.count(), "inverted lists must cover the whole corpus")
  }

  test("sim_pq_topk query executes on the fixture corpus (codes-only path)") {
    val out = ops.LlmData.simPqTopk(spark, sfDir).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(0) != 0L))
    // approximate cosine stays in the unit-vector envelope
    assert(out.forall(r => r.getDouble(1) <= 1.0 + 1e-6))
    // descending, ties id-broken — deterministic presentation
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
