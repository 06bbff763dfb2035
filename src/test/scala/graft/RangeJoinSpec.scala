package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.RangeJoins

/** Semantics of the native band join ([[graft.plans.RangeJoin]] /
  * RangeJoinExec's sliding-window merge) — the spec promised by
  * `Joins.joinRangeNative`'s doc. The oracle here is a brute-force
  * nested-loop evaluation of the band predicate computed in plain
  * Scala, so every structural edge the single-pass merge must get
  * right is pinned independently of Spark's own join paths:
  * key-group transitions, buffer admission/pruning across left rows,
  * NULL keys / NULL order values, multi-column keys, negative lower
  * bounds, and the half-open [lower, upper) boundary. Plus row-for-row
  * identity with the compositional C9 plan on the real events
  * fixture. */
class RangeJoinSpec extends SparkTestBase {

  // rows as (key, key2, ord, id); nulls allowed in the first three
  private type R = (Any, Any, Any, Int)

  private val leftSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("k2", IntegerType),
    StructField("ord", LongType), StructField("lid", IntegerType)))
  private val rightSchema = StructType(Seq(
    StructField("rk", IntegerType), StructField("rk2", IntegerType),
    StructField("rord", LongType), StructField("rid", IntegerType)))

  private def mk(rows: Seq[R], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 3),
      schema)

  /** Brute-force truth: all (lid, rid) with non-NULL equal keys and
    * rord - ord ∈ [lower, upper). */
  private def bruteForce(left: Seq[R], right: Seq[R],
      lower: Long, upper: Long, twoKeys: Boolean): Set[(Int, Int)] =
    (for {
      l <- left if l._1 != null && l._3 != null && (!twoKeys || l._2 != null)
      r <- right if r._1 != null && r._3 != null && (!twoKeys || r._2 != null)
      if l._1 == r._1 && (!twoKeys || l._2 == r._2)
      d = r._3.asInstanceOf[Long] - l._3.asInstanceOf[Long]
      if d >= lower && d < upper
    } yield (l._4, r._4)).toSet

  private def native(left: Seq[R], right: Seq[R],
      lower: Long, upper: Long, twoKeys: Boolean = false): Set[(Int, Int)] = {
    val (lk, rk) =
      if (twoKeys) (Seq("k", "k2"), Seq("rk", "rk2")) else (Seq("k"), Seq("rk"))
    RangeJoins.joinRange(mk(left, leftSchema), mk(right, rightSchema),
        lk, rk, "ord", "rord", lower, upper)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
  }

  test("half-open band boundary: lower inclusive, upper exclusive") {
    val l: Seq[R] = Seq((1, 0, 100L, 1))
    val r: Seq[R] = Seq(
      (1, 0, 99L, 10), (1, 0, 100L, 11), (1, 0, 104L, 12), (1, 0, 105L, 13))
    // band [0, 5): 100 and 104 match; 99 (below) and 105 (== upper) don't
    assert(native(l, r, 0L, 5L) == Set((1, 11), (1, 12)))
  }

  test("NULL keys and NULL order values never match") {
    val l: Seq[R] = Seq((null, 0, 100L, 1), (1, 0, null, 2), (1, 0, 100L, 3))
    val r: Seq[R] = Seq((null, 0, 100L, 10), (1, 0, null, 11), (1, 0, 100L, 12))
    // only the fully-non-NULL pair (3, 12) survives
    assert(native(l, r, 0L, 5L) == Set((3, 12)))
  }

  test("multi-column keys: both must match, NULL in either kills the row") {
    val l: Seq[R] = Seq((1, 1, 100L, 1), (1, 2, 100L, 2), (1, null, 100L, 3))
    val r: Seq[R] = Seq(
      (1, 1, 101L, 10), (1, 2, 102L, 11), (2, 1, 101L, 12), (1, null, 101L, 13))
    val expected = bruteForce(l, r, 0L, 5L, twoKeys = true)
    assert(expected == Set((1, 10), (2, 11)))
    assert(native(l, r, 0L, 5L, twoKeys = true) == expected)
  }

  test("negative lower bound: band reaches before the left row") {
    val l: Seq[R] = Seq((1, 0, 100L, 1), (1, 0, 200L, 2))
    val r: Seq[R] = Seq(
      (1, 0, 89L, 10), (1, 0, 90L, 11), (1, 0, 100L, 12), (1, 0, 109L, 13),
      (1, 0, 110L, 14), (1, 0, 195L, 15))
    val expected = bruteForce(l, r, -10L, 10L, twoKeys = false)
    // 100: [90, 110) → 11,12,13 ; 200: [190, 210) → 15
    assert(expected == Set((1, 11), (1, 12), (1, 13), (2, 15)))
    assert(native(l, r, -10L, 10L) == expected)
  }

  test("randomized key-group transitions and buffer pruning match brute force") {
    // seeded: many keys, many left rows per key, dense + sparse ords —
    // exercises buffer admit/prune/expire across successive left rows
    // and across key-group boundaries, in every partition layout
    val rnd = new scala.util.Random(42)
    def gen(n: Int): Seq[R] = (1 to n).map { i =>
      val key: Any = if (rnd.nextInt(20) == 0) null else rnd.nextInt(8)
      val ord: Any = if (rnd.nextInt(25) == 0) null else rnd.nextInt(300).toLong
      (key, 0, ord, i)
    }
    val l = gen(400)
    val r = gen(400)
    for ((lower, upper) <- Seq((0L, 7L), (-5L, 5L), (3L, 40L))) {
      val expected = bruteForce(l, r, lower, upper, twoKeys = false)
      assert(native(l, r, lower, upper) == expected, s"band [$lower, $upper)")
      assert(expected.nonEmpty) // the bands are wide enough to be non-vacuous
    }
  }

  test("row-for-row identity with the compositional C9 plan on events") {
    val nat = graft.ops.Joins.joinRangeNative(spark, sfDir).collect().toSeq
    val smj = graft.ops.Joins.joinRangeInterval(spark, sfDir).collect().toSeq
    assert(nat == smj)
    assert(nat.nonEmpty)
  }

  test("empty band rejected at construction") {
    intercept[IllegalArgumentException] {
      native(Seq((1, 0, 1L, 1)), Seq((1, 0, 1L, 1)), 5L, 5L)
    }
  }
}
