package graft

import org.apache.spark.sql.functions._
import graft.ops.Profile

/** F11 table-profile laws: the melted two-level pipeline must agree
  * with direct per-column aggregates, and the null paths (mixed and
  * all-NULL columns) must report counts without dividing by zero. */
class ProfileSpec extends SparkTestBase {

  test("F11: profile agrees with direct per-column aggregates on orders") {
    val prof = Profile.statsTableProfile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val o = graft.ops.Util.t(spark, sfDir, "orders")
    val n = o.count()
    assert(prof.size == 6)
    assert(prof.values.forall(_._1 == n), "n_rows constant across columns")
    for (c <- Seq("o_orderkey", "o_orderstatus", "o_orderpriority")) {
      assert(prof(c)._2 == o.filter(col(c).isNull).count(), s"n_nulls($c)")
      assert(prof(c)._3 ==
        o.select(countDistinct(col(c))).head.getLong(0), s"n_distinct($c)")
    }
    // orderkey is the primary key: NDV == row count
    assert(prof("o_orderkey")._3 == n)
  }

  test("profile null paths: mixed column counts, all-NULL column avg_len NULL") {
    import spark.implicits._
    val df = Seq(
      (Some("aa"), Option.empty[String]),
      (Some("bbbb"), None),
      (None, None),
      (Some("aa"), None)).toDF("mixed", "all_null")
    val rows = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = rows("mixed")
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) == ((4L, 1L, 2L)))
    // (2 + 4 + 2) / 3
    assert(math.abs(m.getDouble(4) - 8.0 / 3.0) < 1e-6)
    val a = rows("all_null")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((4L, 4L, 0L)))
    assert(a.isNullAt(4), "all-NULL column: avg_len NULL, not a crash")
  }
}
