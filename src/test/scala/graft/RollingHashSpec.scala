package graft

import graft.functions.RollingHash

/** Native-codegen RollingHash expression: codegen/interpreted parity,
  * reference values, unicode, null handling. */
class RollingHashSpec extends SparkTestBase {

  test("reference fold matches a hand computation") {
    // acc=7; 'a'=97 → 7*31+97 = 314; 'b'=98 → 314*31+98 = 9832
    assert(RollingHash.hash("") == 7L)
    assert(RollingHash.hash("a") == 314L)
    assert(RollingHash.hash("ab") == 9832L)
  }

  test("codegen path equals the reference implementation per row") {
    import spark.implicits._
    RollingHash.register(spark)
    val inputs = Seq("", "a", "hello world", "the quick brown fox",
      "汉字 unicode ✓", "x" * 500)
    val out = inputs.toDF("s")
      .selectExpr("s", "rolling_hash(s) AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s => assert(out(s) == RollingHash.hash(s), s"mismatch for '$s'") }
  }

  test("interpreted (no-codegen) path agrees with codegen") {
    import spark.implicits._
    RollingHash.register(spark)
    val inputs = Seq("abc", "def ghi", "汉字")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val out = inputs.toDF("s").selectExpr("rolling_hash(s)")
        .collect().map(_.getLong(0)).toSeq
      assert(out == inputs.map(RollingHash.hash))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null") {
    import spark.implicits._
    RollingHash.register(spark)
    val out = Seq(Some("x"), None).toDF("s")
      .selectExpr("rolling_hash(s)").collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("text_rolling_hash query is deterministic across runs") {
    val a = ops.LlmData.textRollingHash(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = ops.LlmData.textRollingHash(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
