package graft

/** C46 (bloom-prefiltered semi-join) laws. */
class JoinsSpec extends SparkTestBase {

  test("C46: bloom prefilter + exact join ≡ plain semi-join (no false negatives)") {
    val on  = ops.Joins.joinBloomSemiCore(spark, sfDir, bloomPrefilter = true)
      .collect().toSeq
    val off = ops.Joins.joinBloomSemiCore(spark, sfDir, bloomPrefilter = false)
      .collect().toSeq
    assert(on == off,
      "the bloom probe may only cut bytes moved, never rows returned")
  }

  test("C46: the registered form returns every flag with positive counts") {
    val rows = ops.Joins.joinBloomSemi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0L), "each flag group is non-empty")
  }
}
