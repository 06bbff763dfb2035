package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Data-layout operators — the write-side clustering the reference
  * delegates to its warehouse (`SORTKEY (state_fips, county, tract)`,
  * /root/reference/Test_census_tract.py:236-237, is a 1-dimensional
  * layout declaration). A Z-order (Morton) key generalizes that to
  * multiple dimensions: interleaving the bits of two sort keys gives a
  * single clustering key under which ranges of EITHER dimension stay
  * physically local, so per-file min/max statistics can skip files for
  * predicates on either column — the standard multi-dimensional
  * data-skipping layout (public: Morton 1966; used by every lakehouse
  * OPTIMIZE ZORDER implementation).
  *
  * Scale shape: the key is a pure per-row bit computation (codegen'd
  * built-ins, no shuffle); the layout write is one range partitioning
  * by the key — the same single-sort cost as the reference's SORTKEY,
  * but skippable in both dimensions.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit lane (Morton spread, the classic magic-number dilation). */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of two dimensions
    * (`a` even bits, `b` odd bits). A production layout first
    * normalizes each dimension to a fixed-width rank; the fixture keys
    * already fit 16 bits. */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for 2-dimensional data skipping: range-partition by
    * the Morton key of (a, b) and sort within partitions, so each
    * output file covers a bounded rectangle of BOTH key domains (the
    * property `ZorderSpec` pins). This is the engine-side equivalent
    * of the reference's warehouse SORTKEY, one dimension richer. */
  def zorderLayout(df: DataFrame, a: Column, b: Column,
      numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("z", mortonKey(a.cast("long"), b.cast("long")))
    withZ.repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
  }

  /** F7: Z-order layout audit over `lineitem(l_partkey, l_suppkey)` —
    * per 16-bit Z-prefix bucket (the "file" granularity): row count
    * and the min/max of each dimension. The min/max spans are exactly
    * the per-file statistics a scan would prune on; the curve bounds
    * every bucket to a ≤256×≤256 rectangle of the key domains
    * (bucket = top 16 interleaved bits = top 8 bits of each 16-bit
    * dimension), which `ZorderSpec` asserts. Pure bit arithmetic +
    * one partial-agg pass. */
  def layoutZorder(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        mortonKey(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
          .as("z"))
      .groupBy(shiftright(col("z"), 16).cast("int").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy(col("z_bucket"))
}
