package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stratum ranking / prefix sums WITHOUT a single-task stratum
  * window (round-6 verdict #2/#3).
  *
  * `Window.partitionBy(stratum)` over a low-cardinality key ('en' at
  * web scale = half the corpus) sorts an entire stratum in ONE task —
  * the shape that dies first at 100 TB. This is the same two-pass
  * range-bucketed scheme [[Windows.winNtilePct]] uses for its global
  * ranking, generalized to run inside each stratum:
  *
  *  1. sample order-key range boundaries ONCE driver-side and inline
  *     them as literals, so every plan branch buckets identically
  *     (repartitionByRange would re-sample per materialized subtree —
  *     round-4 review finding);
  *  2. rank / prefix-sum locally per (stratum, bucket) — the corpus
  *     shuffle is a hash exchange on the composite key, every task
  *     holds ~1/buckets of a stratum;
  *  3. per-(stratum, bucket) totals collapse to one row each; their
  *     within-stratum cumulative offsets (a window over ≤ `buckets`
  *     rows per stratum) broadcast back and close the global value.
  *
  * Correctness does not depend on the boundary VALUES (offsets come
  * from actual bucket counts), only on all branches agreeing — which
  * literals guarantee. Ties share a bucket by construction (`>` on the
  * boundary), so equal order keys never straddle a split.
  */
object Strata {

  /** Per-stratum `row_number() OVER (PARTITION BY strata ORDER BY
    * orderCol)` as an `out` column, computed two-pass. `orderCol` must
    * be numeric (it is range-sampled) and unique per row for the rank
    * to be deterministic. */
  def rank(df: DataFrame, strata: Seq[String], orderCol: String,
      out: String = "rn", buckets: Int = 32): DataFrame =
    twoPass(df, strata, orderCol, None, out, buckets)

  /** Per-stratum running `SUM(valueCol) OVER (PARTITION BY strata
    * ORDER BY orderCol ROWS UNBOUNDED PRECEDING)` as an `out` column,
    * computed two-pass (the distributed prefix-sum shape). `valueCol`
    * must be NON-NEGATIVE: each bucket's total is read off as the max
    * running value (so the offsets aggregate consumes the window
    * output and the corpus shuffle is shared, not recomputed), which
    * equals the bucket sum only when the running sum is
    * non-decreasing. */
  def prefixSum(df: DataFrame, strata: Seq[String], orderCol: String,
      valueCol: String, out: String = "cum", buckets: Int = 32): DataFrame =
    twoPass(df, strata, orderCol, Some(valueCol), out, buckets)

  private def twoPass(df: DataFrame, strata: Seq[String], orderCol: String,
      valueCol: Option[String], out: String, buckets: Int): DataFrame = {
    val bounds = df.stat
      .approxQuantile(orderCol,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .map(_.toLong).distinct.sorted
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val parts = df.withColumn("__pid", pid)
    val keys = strata.map(col) :+ col("__pid")
    val localW = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val cumW = localW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCol match {
      case None =>
        parts.withColumn("__loc", row_number().over(localW).cast("long"))
      case Some(v) => parts.withColumn("__loc", sum(col(v)).over(cumW))
    }
    // one row per (stratum, bucket); aggregated FROM THE WINDOW OUTPUT
    // (the bucket total is the max local cumulative — the last row of
    // the bucket), so the corpus scan + (stratum, bucket) exchange
    // subtree is byte-identical in both join branches and the shuffle
    // is computed once and reused, not re-scanned (verified by the
    // exchange-reuse plan audit). The offsets window then runs over
    // ≤ `buckets` rows per stratum — metadata-scale, broadcast back.
    val offW = Window.partitionBy(strata.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(keys: _*).agg(max(col("__loc")).as("__tot"))
      .select((strata.map(col) :+ col("__pid") :+
        coalesce(sum(col("__tot")).over(offW), lit(0L)).as("__off")): _*)
    local.join(broadcast(offsets), strata :+ "__pid")
      .withColumn(out, col("__off") + col("__loc"))
      .drop("__pid", "__loc", "__off")
  }
}
