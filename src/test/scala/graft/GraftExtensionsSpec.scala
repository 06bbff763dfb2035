package graft

/** SparkSessionExtensions injection: the shared test session is built
  * with `spark.sql.extensions=graft.GraftExtensions` (like a configured
  * cluster), so the custom expressions must resolve WITHOUT any
  * explicit register() call. */
class GraftExtensionsSpec extends SparkTestBase {

  test("rolling_hash resolves from the extensions-injected registry") {
    import spark.implicits._
    val h = Seq("ab").toDF("s").selectExpr("rolling_hash(s)")
      .collect().head.getLong(0)
    assert(h == graft.functions.RollingHash.hash("ab"))
  }

  test("char_ngrams resolves from the extensions-injected registry") {
    import spark.implicits._
    val out = Seq("abcd").toDF("s").selectExpr("char_ngrams(s, 2)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "ab"), (1, "bc"), (2, "cd")))
  }

  test("injected functions are usable from plain SQL") {
    spark.sql("SELECT rolling_hash('a') AS h").collect().head.getLong(0) ==
      graft.functions.RollingHash.hash("a")
    val n = spark.sql("SELECT char_ngrams('xyz')").count()
    assert(n == 1)
  }

  test("the AsOfJoinOptimization rule arrives via the extensions path") {
    // AsOf.joinAsOf also installs the rule imperatively
    // (ensureStrategy), so assert the CONFIG path independently: a
    // cluster session configured with graft.GraftExtensions must carry
    // the rule in its optimizer batches before any graft call runs
    val rules = spark.sessionState.optimizer.batches.flatMap(_.rules)
    assert(rules.contains(graft.plans.AsOfJoinOptimization),
      "optimizer batches must include the injected AsOfJoinOptimization")
  }
}
