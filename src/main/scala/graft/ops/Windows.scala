package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Category E — window functions (SURVEY.md §2.2 E1-E6).
  *
  * Every window is partitioned (one shuffle on the partition key, sort
  * within partition) except E6, whose single global window is a declared
  * semantic (global quartiles); at 100 TB global ranking would move to a
  * range-partitioned two-pass (sample → range bounds → rank offset) —
  * noted in Scaladoc rather than hidden behind a silent bottleneck.
  */
object Windows {

  /** E1: rank / dense_rank / row_number per market segment. */
  def winRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, sfDir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** E2: running decimal revenue per customer (rows frame). */
  def winRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec(col("o_totalprice"))).over(w)).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** E3: 3-row moving average per customer (SUM/COUNT form — matches the
    * D1 avg oracle pattern exactly; AVG(decimal) result types diverge
    * between engines, SUM/COUNT does not). */
  def winSlidingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec(col("o_totalprice"))).over(w)
          / count(lit(1)).over(w)).as("moving_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** E4: RANGE frame on integer cents — per-nation sum of account
    * balances within 10000 cents below the current row's value. */
  def winRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("bal_cents"))
      .rangeBetween(-10000L, Window.currentRow)
    t(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"),
        cents(col("s_acctbal")).as("bal_cents"))
      .select(col("s_suppkey"), col("s_nationkey"), col("bal_cents"),
        sum(col("bal_cents")).over(w).as("range_sum_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** E5: lead/lag per user over the event stream + gap to previous. */
  def winLeadLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** E6: ntile / percent_rank / cume_dist over global order totals.
    * Global window = declared semantic; see class doc for the 100 TB path. */
  def winNtilePct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("tp_cents"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("tp_cents"))
      .select(col("o_orderkey"), col("tp_cents"),
        ntile(4).over(w).as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }
}
