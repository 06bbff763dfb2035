package graft

/** H8: map functions — str-keyed map construction, sorted keys, and the
  * reference's `x-ratelimit` prefix filter (`Test_census_tract.py:92`). */
class FnMapSpec extends SparkTestBase {

  test("fn_map: sorted keys and ratelimit-prefix filtering") {
    val rows = ops.Fns.fnMap(spark, sfDir).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "content-type,etype,x-ratelimit-remaining")
      assert(r.getString(2) == s"""{"x-ratelimit-remaining":"$id"}""")
    }
  }

  test("map_filter drops every non-matching key (empty-map case)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq(1).toDF("i")
      .select(map_filter(
        map(lit("a"), lit("1"), lit("b"), lit("2")),
        (k, _) => k.startsWith("x-")).as("m"))
      .collect().head.getMap[String, String](0)
    assert(out.isEmpty)
  }
}
