package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Category G — set operations (SURVEY.md §2.2 G1-G3). */
object SetOps {

  private def custNations(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer").select(col("c_nationkey").as("nationkey"))

  private def suppNations(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier").select(col("s_nationkey").as("nationkey"))

  /** G1: nations with customers ∪ nations with suppliers (distinct). */
  def setUnionDistinct(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).union(suppNations(spark, sfDir))
      .distinct().orderBy(col("nationkey"))

  /** G2: nations with both customers and suppliers. */
  def setIntersect(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersect(suppNations(spark, sfDir))
      .orderBy(col("nationkey"))

  /** G3: nations with customers but no suppliers. */
  def setExcept(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).except(suppNations(spark, sfDir))
      .orderBy(col("nationkey"))

  /** G4: INTERSECT ALL — the multiset semantics G2's distinct form
    * erases: per nation, min(customer multiplicity, supplier
    * multiplicity) surviving rows (ANSI bag intersection). The
    * post-aggregation count makes the multiplicity itself the checked
    * value — a DISTINCT-based shortcut would emit n = 1 everywhere
    * and fail the oracle. */
  def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersectAll(suppNations(spark, sfDir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  /** G5: EXCEPT ALL — per nation, max(customer multiplicity −
    * supplier multiplicity, 0) surviving rows (ANSI bag difference);
    * nations with more suppliers than customers vanish entirely. */
  def setExceptAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).exceptAll(suppNations(spark, sfDir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  /** G6: SYMMETRIC DIFFERENCE — orders with returned ('R') lines vs
    * orders with accepted ('A') lines, keeping exactly the orders in
    * ONE camp (the "purely returned / purely clean" split a returns
    * analyst wants; mixed orders vanish): (R ∖ A) ∪ (A ∖ R), each
    * side tagged. An order's line count is BOUNDED, so the
    * one-camp-only population stays non-degenerate at every scale —
    * a dense-membership pair (user-halves) empties as density grows.
    * Composed from the ANSI operators: two EXCEPTs (distinct + anti
    * semantics on the key — one shuffle each) + a UNION ALL of
    * disjoint sides. */
  def setSymmetricDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    def withFlag(f: String) = li.filter(col("l_returnflag") === f)
      .select(col("l_orderkey")).distinct()
    val r = withFlag("R"); val a = withFlag("A")
    r.except(a).select(col("l_orderkey"), lit("returned_only").as("side"))
      .unionAll(a.except(r)
        .select(col("l_orderkey"), lit("accepted_only").as("side")))
      .orderBy(col("side"), col("l_orderkey"))
  }
}
