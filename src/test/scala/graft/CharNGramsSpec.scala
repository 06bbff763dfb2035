package graft

import graft.functions.CharNGrams

/** I3: the custom Catalyst Generator — lateral char-n-gram expansion
  * planned by GenerateExec, invoked from SQL. */
class CharNGramsSpec extends SparkTestBase {

  test("char_ngrams emits (pos, gram) for every window of length n") {
    import spark.implicits._
    CharNGrams.register(spark)
    val out = Seq("abcd").toDF("s")
      .selectExpr("char_ngrams(s)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "abc"), (1, "bcd")))
  }

  test("strings shorter than n and NULLs emit no rows") {
    import spark.implicits._
    CharNGrams.register(spark)
    val out = Seq(Some("ab"), None).toDF("s")
      .selectExpr("char_ngrams(s)").collect()
    assert(out.isEmpty)
  }

  test("explicit n literal and SQL-over-view invocation") {
    import spark.implicits._
    CharNGrams.register(spark)
    Seq((1L, "hello")).toDF("id", "s").createOrReplaceTempView("cng_t")
    val out = spark.sql("SELECT id, char_ngrams(s, 2) FROM cng_t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 0, "he"), (1L, 1, "el"), (1L, 2, "ll"), (1L, 3, "lo")))
  }

  test("astral codepoints count as one character (SQL substr semantics)") {
    import spark.implicits._
    CharNGrams.register(spark)
    // 𝄞 is a surrogate pair in UTF-16 but ONE character
    val out = Seq("𝄞ab").toDF("s")
      .selectExpr("char_ngrams(s)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "𝄞ab")))
  }

  test("udtf_generator query runs and matches a hand computation") {
    val out = ops.Fns.udtfGenerator(spark, sfDir)
    val first = out.limit(3).collect().map(r => (r.getInt(1), r.getString(2)))
    // fixture p_name values are "<adj> <noun>" — first part's first grams
    assert(first.nonEmpty)
    assert(first.forall(_._2.length == 3))
  }
}
