package graft

import org.apache.spark.sql.functions._

/** E15 (exact Lorenz / cumulative-share curve) laws. */
class WindowsSpec extends SparkTestBase {

  test("E15: hand-checked crossing counts and decile share, ties included") {
    import spark.implicits._
    // one group: cents 100, 50, 50, 25, 25 → total 250
    //  - half (125) is reached by {100, one 50} → n_to_half = 2,
    //    completed INSIDE the 50-tie block
    //  - k = ⌈5/10⌉ = 1 → top-decile = the 100 order → share 0.4
    val rows = Seq(100L, 50L, 50L, 25L, 25L).map(("a", _))
      .toDF("pri", "tc").repartition(3)
    val r = ops.Windows.cumulativeShareCore(rows).collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 250L)
    assert(r.getLong(3) == 1L, "top decile of 5 orders is 1 order")
    assert(r.getDouble(4) == 0.4)
    assert(r.getLong(5) == 2L, s"n_to_half was ${r.getLong(5)}")
    assert(r.getDouble(6) == 0.4)
  }

  test("E15: a uniform group needs half the orders to reach half the mass") {
    import spark.implicits._
    val rows = (1 to 100).map(_ => ("u", 700L)).toDF("pri", "tc")
    val r = ops.Windows.cumulativeShareCore(rows).collect().head
    assert(r.getLong(5) == 50L)
    // decile share of a uniform distribution is exactly 10%
    assert(r.getDouble(4) == 0.1)
  }

  test("E15: the fixture query is deterministic and monotone-sane") {
    val out = ops.Windows.winCumulativeShare(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(4) >= 0.1 - 1e-9,
        "the top decile can never hold less than a tenth of the mass")
      assert(r.getLong(5) * 2 <= r.getLong(1) + 1,
        "reaching half the mass never needs more than ~half the orders" +
          " when sorted richest-first")
    }
  }
}
