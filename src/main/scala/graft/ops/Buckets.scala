package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared LSH-bucket pair expansion.
  *
  * Given a SORTED array column (sort_array of a bucket's collected
  * members), emits every ordered pair (i < j) as array<struct<a, b>>
  * with `a` preceding `b` in the sort order — so when the array is
  * sorted by id, `a < b` holds for every pair and a downstream
  * distinct() dedupes cross-band collisions. One definition shared by
  * the MinHash, SimHash, embedding-LSH, and Jaccard-bucket paths
  * (the 1-based slice arithmetic was previously copy-pasted four
  * times — round-4 review finding). */
object Buckets {
  def sortedPairs(items: Column): Column =
    flatten(transform(items, (x, i) =>
      transform(slice(items, i + lit(2), size(items)), y =>
        struct(x.as("a"), y.as("b")))))
}
