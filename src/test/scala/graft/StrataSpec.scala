package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Strata

/** The two-pass range-bucketed stratum rank / prefix sum must equal the
  * single-window form bit-for-bit — on skewed strata, tiny strata
  * (smaller than the bucket count), and single-row strata. */
class StrataSpec extends SparkTestBase {

  private def randomDf(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // skewed strata: 'a' takes ~70% of rows; ids shuffled so range
    // buckets interleave strata; values non-negative (prefixSum contract)
    val rows = rnd.shuffle((0 until n).toList).map { i =>
      val s = rnd.nextInt(10) match {
        case x if x < 7 => "a"
        case 7 | 8 => "b"
        case _ => "c"
      }
      (i.toLong, s, rnd.nextInt(100).toLong)
    }
    rows.toDF("id", "stratum", "v")
  }

  test("rank equals the single-window row_number on skewed strata") {
    val df = randomDf(5000, seed = 42)
    val w = Window.partitionBy(col("stratum")).orderBy(col("id"))
    val truth = df.withColumn("rn", row_number().over(w).cast("long"))
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Strata.rank(df, Seq("stratum"), "id")
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }

  test("prefixSum equals the single-window running sum on skewed strata") {
    val df = randomDf(5000, seed = 7)
    val w = Window.partitionBy(col("stratum")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val truth = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Strata.prefixSum(df, Seq("stratum"), "id", "v")
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }

  test("degenerate shapes: strata smaller than the bucket count, single rows") {
    import spark.implicits._
    // 3 rows in one stratum, 1 in another — far fewer rows than the 32
    // range buckets; every bucket boundary collapses
    val df = Seq((10L, "x", 5L), (20L, "x", 6L), (30L, "x", 7L), (40L, "y", 9L))
      .toDF("id", "stratum", "v")
    val ranked = Strata.rank(df, Seq("stratum"), "id")
      .select(col("id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranked == Map(10L -> 1L, 20L -> 2L, 30L -> 3L, 40L -> 1L))
    val summed = Strata.prefixSum(df, Seq("stratum"), "id", "v")
      .select(col("id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(summed == Map(10L -> 5L, 20L -> 11L, 30L -> 18L, 40L -> 9L))
  }

  test("empty input yields an empty result, not a failure") {
    import spark.implicits._
    val df = Seq.empty[(Long, String, Long)].toDF("id", "stratum", "v")
    assert(Strata.rank(df, Seq("stratum"), "id").count() == 0)
    assert(Strata.prefixSum(df, Seq("stratum"), "id", "v").count() == 0)
  }
}
