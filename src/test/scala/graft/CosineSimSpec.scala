package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSim

/** Native-codegen CosineSim: codegen/interpreted parity, agreement
  * with the HOF formulation it replaced, null/mismatch semantics. */
class CosineSimSpec extends SparkTestBase {

  private def pairsDf(vs: Seq[(Seq[Double], Seq[Double])]) = {
    import spark.implicits._
    vs.toDF("a", "b")
  }

  private val samples: Seq[(Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(77)
    def v() = Seq.fill(16)(rnd.nextGaussian())
    Seq.fill(20)((v(), v())) :+ ((Seq(1.0, 0.0), Seq(1.0, 0.0))) :+
      ((Seq(1.0, 0.0), Seq(0.0, 1.0))) :+ ((Seq(1.0, 2.0), Seq(-1.0, -2.0)))
  }

  test("matches the reference dot/norm formula on random vectors") {
    val got = pairsDf(samples)
      .select(CosineSim(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    samples.zip(got).foreach { case ((a, b), c) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val exp = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(c - exp) < 1e-12, s"$a · $b")
    }
  }

  test("identical, orthogonal, and opposite vectors hit 1 / 0 / -1") {
    val out = pairsDf(Seq(
        (Seq(3.0, 4.0), Seq(3.0, 4.0)),
        (Seq(1.0, 0.0), Seq(0.0, 2.0)),
        (Seq(3.0, 4.0), Seq(-3.0, -4.0)))) // 5*5 and sqrt(25) are exact
      .select(CosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == -1.0)
  }

  test("interpreted (no-codegen) path agrees with codegen") {
    val prevWhole = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    // capture the pre-test value (not a hardcoded default) so the
    // shared session's config is restored exactly (round-5 advice)
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val codegen = pairsDf(samples)
      .select(CosineSim(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = pairsDf(samples)
        .select(CosineSim(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
      assert(interp == codegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWhole)
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("array<float> inputs widen implicitly (fixture's native embedding type)") {
    import spark.implicits._
    val out = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(CosineSim(col("a"), col("b")))
      .head()
    assert(!out.isNullAt(0) && math.abs(out.getDouble(0) - 1.0) < 1e-12)
    // and via SQL, where the round-5 advice found the hard failure
    graft.functions.CosineSim.register(spark)
    val sql = Seq((Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    sql.createOrReplaceTempView("cos_float_in")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM cos_float_in").head()
    assert(!viaSql.isNullAt(0) && math.abs(viaSql.getDouble(0) - 1.0) < 1e-12)
  }

  test("null input, null element, and length mismatch yield null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), None),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))))
      .toDF("a", "b")
      .select(CosineSim(col("a").cast("array<double>"),
        col("b").cast("array<double>")))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("sql registration via extensions: cosine_sim is callable") {
    val out = pairsDf(Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))))
      .selectExpr("cosine_sim(a, b)").collect()
    assert(out.head.getDouble(0) == 1.0)
  }

  test("ann re-rank results are unchanged by the native kernel") {
    // same fixture probes as AnnLshSpec/AnnIvfSpec — scores must stay
    // valid cosines and tie-broken ordering must hold
    val out = ops.LlmData.simAnnTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.forall(p => p._2 >= -1.0 && p._2 <= 1.0))
    val scores = out.map(_._2)
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }
}
