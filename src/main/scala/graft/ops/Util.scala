package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query library.
  *
  * Determinism contract (SURVEY.md §2.2): every oracle-checked query
  *  - ends in a fully tie-broken ORDER BY,
  *  - never aggregates raw DOUBLE — inputs are cast to DECIMAL(18,4) and
  *    aggregate results to DECIMAL(38,6) so Spark and DuckDB agree
  *    bit-for-bit,
  *  - uses explicit NULLS FIRST/LAST on every nullable sort key (Spark and
  *    DuckDB have opposite defaults).
  */
object Util {
  /** Read one fixture table. Parquet scan → Catalyst handles column
    * pruning + predicate pushdown; at cluster scale this is the same call
    * against a partitioned table root. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** DECIMAL(18,4)-cast an input column before aggregation (contract rule 2). */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Fix an aggregate/computed decimal to DECIMAL(38,6) (contract rule 2). */
  def money(c: Column): Column = c.cast("decimal(38,6)")

  /** Exact average: SUM(decimal)/COUNT, fixed to DECIMAL(38,6). Exact
    * decimal sums agree across engines; the single final division is the
    * only rounding point. */
  def avgDec(c: Column): Column =
    money(sum(dec(c)) / count(lit(1)))
}
