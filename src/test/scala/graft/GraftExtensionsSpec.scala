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

  test("sentinel-clean filters rewrite to pushable raw predicates") {
    import org.apache.spark.sql.functions.col
    // IS NOT NULL over the cleaned column: without the rule this is a
    // CaseWhen the scan can't see; with it the raw predicate reaches
    // PushedFilters (the round-8 §4.2 document-only item, now real)
    val df = graft.ops.Util.t(spark, sfDir, "part")
      .select(col("p_partkey"),
        graft.census.Normalize.sentinelToNull(col("p_retailprice")).as("clean"))
      .filter(col("clean").isNotNull && col("clean") > 100)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(p_retailprice)"), p)
    assert(p.contains("GreaterThan(p_retailprice"), p)
    // and the rewrite is semantics-preserving vs the unoptimized form:
    // sentinel rows (none in the fixture) aside, planted check below
  }

  test("sentinel-clean rewrite keeps planted sentinel rows out, NOT under Not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val df = Seq((1L, 50L), (2L, -666666666L), (3L, 200L)).toDF("id", "v")
      .select(col("id"),
        graft.census.Normalize.sentinelToNull(col("v")).as("clean"))
    // positive positions: rewrite fires, sentinel row must NOT survive
    assert(df.filter(col("clean").isNotNull).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(df.filter(col("clean") > 100).select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    assert(df.filter(col("clean").isNull).select("id")
      .collect().map(_.getLong(0)).toSet == Set(2L))
    // under Not the rule must stay out: NOT(clean > 100) is NULL for
    // the sentinel row → filtered; a naive rewrite would return it
    assert(df.filter(!(col("clean") > 100)).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // null-sensitive <=> must be untouched
    assert(df.filter(col("clean") <=> when(col("id") < 0, col("id")))
      .select("id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("sentinel-clean rewrite stays off non-numeric (string) raw columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a STRING column run through the same cleaning shape: coercion
    // puts a LOSSY cast under the sentinel comparison ("oak" casts to
    // NULL), so the old rewrite of IsNotNull(clean) into
    // IsNotNull(cast(v)) AND cast(v) > thr would wrongly drop every
    // non-numeric row — the clean value is the untouched string. The
    // numeric/temporal type gate keeps the rule out here.
    // under ANSI (the session default) the lossy cast THROWS, so the
    // silent-wrong-rows hazard is specific to ANSI-off sessions — pin
    // it there
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = Seq((1L, "oak"), (2L, "-666666666"), (3L, "200"))
        .toDF("id", "v")
        .select(col("id"),
          graft.census.Normalize.sentinelToNull(col("v")).as("clean"))
      assert(df.filter(col("clean").isNotNull).select("id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L),
        "non-numeric strings are clean (NOT NULL) and must survive")
      assert(df.filter(col("clean").isNull).select("id")
        .collect().map(_.getLong(0)).toSet == Set(2L))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
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

  test("the RangeJoinOptimization rule arrives via the extensions path") {
    val rules = spark.sessionState.optimizer.batches.flatMap(_.rules)
    assert(rules.contains(graft.plans.RangeJoinOptimization),
      "optimizer batches must include the injected RangeJoinOptimization")
  }

  test("LSH kernel functions resolve from SQL (minhash_sig/simhash_fp/hyperplane_codes)") {
    import graft.functions.{MinHashSig, SimHashFp}
    import org.apache.spark.unsafe.types.UTF8String
    val sig = spark.sql("SELECT minhash_sig('a b c d') AS s")
      .collect().head.getSeq[Long](0)
    assert(sig == MinHashSig.compute(UTF8String.fromString("a b c d"))
      .toLongArray.toSeq)
    val fp = spark.sql("SELECT simhash_fp('a b c') AS f")
      .collect().head.getLong(0)
    assert(fp == SimHashFp.compute(UTF8String.fromString("a b c")))
    val codes = spark.sql(
        "SELECT hyperplane_codes(array(CAST(1.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)), 2, 4) AS c")
      .collect().head.getSeq[Int](0)
    assert(codes.length == 2)
  }

  test("joinRange API rejects unknown columns and mismatched key lists") {
    val df = graft.ops.Util.t(spark, sfDir, "events")
    val r = df.select(org.apache.spark.sql.functions.col("user_id").as("r_user_id"),
      org.apache.spark.sql.functions.col("ts").as("r_ts"))
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoins.joinRange(df, r,
        Seq("no_such_col"), Seq("r_user_id"), "ts", "r_ts", 0L, 10L)
    }
    intercept[IllegalArgumentException] {
      graft.plans.RangeJoins.joinRange(df, r,
        Seq("user_id", "event_id"), Seq("r_user_id"), "ts", "r_ts", 0L, 10L)
    }
  }
}
