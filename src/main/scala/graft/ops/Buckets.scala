package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH-bucket machinery: pair expansion and skew-capped bucket
  * membership.
  *
  * [[sortedPairs]]: given a SORTED array column (sort_array of a
  * bucket's collected members), emits every ordered pair (i < j) as
  * array<struct<a, b>> with `a` preceding `b` in the sort order — so
  * when the array is sorted by id, `a < b` holds for every pair and a
  * downstream distinct() dedupes cross-band collisions. One definition
  * shared by the MinHash, SimHash, embedding-LSH, and Jaccard-bucket
  * paths (the 1-based slice arithmetic was previously copy-pasted four
  * times — round-4 review finding).
  *
  * [[members]]: adversarial-skew guard (round-4 verdict). An LSH bucket
  * is similarity-driven and normally small, but a degenerate corpus
  * (millions of identical documents) lands them all in one bucket: an
  * uncapped collect_list builds one giant row (OOM at scale) and the
  * pair expansion goes quadratic. `members` caps each bucket at `cap`
  * members BEFORE collecting — a row_number window over the bucket key
  * keeps the `cap` smallest member ids, so the collected array is
  * bounded no matter the corpus — and reports the uncollected remainder
  * per bucket in an `n_overflow` column so callers can surface/alert on
  * truncation instead of discovering it as silent recall loss. The
  * window and the aggregation hash-partition on the same key, so the cap
  * costs a within-partition sort, not an extra shuffle.
  */
object Buckets {
  /** Default per-bucket membership cap: 256 members → ≤ 32,640 pairs
    * per bucket, a bounded row and a bounded expansion. */
  val MaxBucket = 256

  def sortedPairs(items: Column): Column =
    flatten(transform(items, (x, i) =>
      transform(slice(items, i + lit(2), size(items)), y =>
        struct(x.as("a"), y.as("b")))))

  /** Capped, sorted bucket membership: groups `df` by `keyCols`,
    * collecting at most `cap` members (the smallest by `orderCol`) into
    * a sorted `ids` array, with `n_overflow` = members beyond the cap.
    * Only buckets with ≥ 2 kept members survive (singletons generate no
    * pairs). `payload` is what gets collected — the id itself, or a
    * struct carrying verification state (e.g. SimHash fingerprints). */
  def members(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      payload: Column, cap: Int = MaxBucket): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sort_array(collect_list(when(col("__rn") <= cap, payload))).as("ids"),
        greatest(count(lit(1)) - cap, lit(0L)).as("n_overflow"))
      .filter(size(col("ids")) > 1)
  }

  /** Total members dropped by the cap across all buckets — the
    * truncation signal a production pipeline would emit as a metric. */
  def overflowTotal(buckets: DataFrame): Long =
    Option(buckets.agg(sum(col("n_overflow"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
}
