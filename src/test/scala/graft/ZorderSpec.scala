package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: bit-exact Morton key + the locality property the
  * layout exists for (bounded per-bucket rectangles = prunable
  * per-file min/max stats). */
class ZorderSpec extends SparkTestBase {

  /** Reference software Morton interleave (bit-at-a-time). */
  private def morton(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("mortonKey matches the bit-at-a-time reference on sample keys") {
    import spark.implicits._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (19999L, 999L), (65535L, 65535L), (65536L, 0L), (12345L, 54321L))
    val got = samples.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- samples)
      // mortonKey masks to the low 16 bits, as does the reference fold
      assert(got((a, b)) == morton(a & 0xFFFF, b & 0xFFFF),
        s"morton($a, $b)")
  }

  test("every z-bucket bounds both dimensions to a ≤256×≤256 rectangle (F7)") {
    // bucket = top 16 interleaved bits = top 8 bits of each dimension:
    // the per-bucket min/max stats a scan prunes on stay narrow in BOTH
    // key domains — the property a 1-D sort key cannot give the second
    // dimension
    val rows = Layout.layoutZorder(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) - r.getLong(2) <= 255L, s"partkey span in $r")
      assert(r.getLong(5) - r.getLong(4) <= 255L, s"suppkey span in $r")
    }
  }

  test("F10: zone-map skipping is sound and actually prunes") {
    val r = Layout.layoutZonemapSkip(spark, sfDir).collect().head
    val (nFiles, nCand, nMatch) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (rowsTotal, rowsScanned) = (r.getLong(3), r.getLong(4))
    val (rowsMatched, rowsMissed) = (r.getLong(5), r.getLong(6))
    assert(rowsMissed == 0L,
      "zone overlap must never prune a file holding matches")
    assert(nMatch <= nCand && nCand <= nFiles)
    assert(rowsScanned <= rowsTotal && rowsMatched <= rowsScanned)
    // the Z-order layout must make skipping WORTH it: candidates are a
    // strict minority of the files (each file spans ≤256 part keys)
    assert(nCand * 2 < nFiles,
      s"zone maps pruned too little: $nCand of $nFiles files candidate")
    // ground truth: matched rows == a direct filter count
    val direct = graft.ops.Util.t(spark, sfDir, "lineitem")
      .filter(col("l_partkey").between(400L, 480L)).count()
    assert(rowsMatched == direct)
  }

  test("zorderLayout range-partitions: partition z-ranges never overlap") {
    import spark.implicits._
    val li = graft.ops.Util.t(spark, sfDir, "lineitem")
    val ranges = Layout
      .zorderLayout(li, col("l_partkey"), col("l_suppkey"), 4)
      .select(spark_partition_id().as("pid"), col("z"))
      .groupBy($"pid").agg(min($"z").as("lo"), max($"z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.nonEmpty)
    for (w <- ranges.sliding(2).filter(_.length == 2))
      assert(w(0)._2 <= w(1)._1,
        s"overlapping partition z-ranges: ${ranges.mkString(", ")}")
  }
}
