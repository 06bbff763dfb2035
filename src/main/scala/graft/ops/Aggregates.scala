package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Category D — aggregations (SURVEY.md §2.2 D1-D9).
  *
  * All aggregates follow the decimal contract. Spark plans these as partial
  * (map-side) + final hash aggregates — the shuffle moves one row per
  * (group × partition), not the raw data, which is what makes them scale.
  */
object Aggregates {

  /** D1: TPC-H Q1 shape over lineitem. */
  def aggHashQ1(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
        avgDec(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
