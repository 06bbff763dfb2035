package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Category B — projections / filters (SURVEY.md §2.2 B1-B4). */
object Filters {

  /** B1: compound predicate — range + comparison + IN list. All three
    * conjuncts push down to the parquet scan. */
  def filterCompound(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_discount").between(lit(0.05d), lit(0.07d))
        && col("l_quantity") < lit(24.0d)
        && col("l_returnflag").isin("A", "R"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique — tie-break on all columns
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"))

  /** B2: LIKE + IS NOT NULL. */
  def filterNullLike(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .filter(col("p_name").like("%widget%") && col("p_brand").isNotNull)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))

  /** B3: computed projection — exact-decimal discounted price (finalized
    * to DOUBLE per the determinism contract) + shipdate year. */
  def projectCompute(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        dbl(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("disc_price"),
        year(col("l_shipdate")).as("ship_year"))
      // (l_orderkey, l_linenumber) is NOT unique — tie-break on all columns
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"),
        col("ship_year"))

  /** B5: scalar-subquery filter — customers above the global average
    * balance. The comparison is algebraically rearranged to exact
    * decimal (`bal * n > sum`) so no float-division boundary can flip a
    * row between engines; Catalyst plans the scalar subquery as a
    * one-row broadcast, the scan stays a single pass. */
  def filterSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("graft_customer_sq")
    spark.sql(
      """SELECT c_custkey, c_acctbal
        |FROM graft_customer_sq
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
        |      (SELECT COUNT(*) FROM graft_customer_sq)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |       FROM graft_customer_sq)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** B4: reference R7/R8 applied to data — `upper(trim(...))`
    * normalization (`Test_census_tract.py:352`), `translate` cleanup, and
    * rename-by-mapping (`:354`) via [[graft.census.Normalize.renameByMapping]]. */
  def projectRenameNorm(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "customer")
      .select(col("c_custkey"),
        translate(col("c_name"), "#", "_").as("name_norm"),
        upper(trim(col("c_mktsegment"))).as("segment_norm"))
    graft.census.Normalize
      .renameByMapping(df, Map("C_CUSTKEY" -> "customer_id"))
      .orderBy(col("customer_id"))
  }
}
