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
}
