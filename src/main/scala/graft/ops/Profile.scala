package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Table-statistics profiling — the ANALYZE movement. The reference
  * never collects statistics (its Redshift tables rely on the
  * warehouse's own ANALYZE, `Test_census_tract.py:210-260` just
  * CREATE+COPYs); a standalone engine needs them itself: per-column
  * null counts, exact NDV, and width feed the cost-based optimizer
  * (join reordering, broadcast decisions), and at 100 TB they are also
  * the first data-quality gate a new load passes through.
  */
object Profile {

  /** F11: one-pass per-column profile of `orders` — for every column
    * its row count, null count, exact distinct count, and average
    * canonical width. Columns are first rendered to one CANONICAL
    * string form (BIGINT/DATE text is engine-identical; the DOUBLE
    * price goes through integer cents first — raw float rendering is
    * the one encoding Spark and DuckDB disagree on), then `stack`
    * melts the table to (col_name, val) rows so ONE aggregation
    * pipeline profiles every column.
    *
    * Scale shape: the melt is a generator (rows × n_cols narrow
    * 2-column rows, no shuffle), and the exact NDV runs as TWO
    * partial-aggregate levels — groupBy (col_name, val) collapses to
    * vocabulary cardinality map-side, then the per-column rollup
    * reduces that; nothing ever funnels a column's raw values through
    * one task, and no `count(distinct)` Expand multiplies the scan.
    * avg_len stays exact-integer until one final proven decimal
    * division. */
  def statsTableProfile(spark: SparkSession, sfDir: String): DataFrame =
    profile(t(spark, sfDir, "orders").select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_custkey").cast("string").as("o_custkey"),
      col("o_orderstatus"),
      cents(col("o_totalprice")).cast("string").as("o_totalprice_cents"),
      col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
      col("o_orderpriority")))

  /** Feed statistics INTO the optimizer — the consumer side of the F11
    * profile (the verdict's "nothing injects it" gap): persist `df` as
    * a catalog table and run the ANALYZE pair, so the cost-based
    * optimizer costs the table from REAL row counts and per-column
    * NDV/min/max instead of file sizes alone. The payoff is filter
    * CARDINALITY estimation: without column stats a Filter's estimated
    * size is its child's (Spark cannot price a predicate it knows
    * nothing about), so a highly selective filtered join still plans
    * as a shuffle; with stats the equality-on-high-NDV estimate
    * collapses to rows/NDV and the join side drops under the broadcast
    * threshold — the decision flip `PlanAuditSpec` pins. At 100 TB
    * this is the difference between a dimension-shaped subquery
    * broadcasting and a full fact-fact shuffle.
    *
    * ANALYZE itself is one scan (row count + per-column sketch-backed
    * NDV), the same pass every warehouse schedules after a load. */
  def analyzeIntoCatalog(spark: SparkSession, df: DataFrame,
      table: String, statCols: Seq[String]): Unit = {
    df.write.mode("overwrite").saveAsTable(table)
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (statCols.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        statCols.mkString(", "))
    ()
  }

  /** The profiling pipeline over an already-CANONICAL (all-string)
    * frame — melt, two-level exact-NDV aggregation, exact-integer
    * width accounting. An all-NULL column reports `avg_len` NULL
    * (never a division by zero — the K49 lesson). */
  def profile(canon: DataFrame): DataFrame = {
    val stackArgs = canon.columns.map(c => s"'$c', `$c`").mkString(", ")
    val stacked = canon.select(
      expr(s"stack(${canon.columns.length}, $stackArgs) AS (col_name, val)"))
    stacked.groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("col_name"))
      .agg(sum(col("c")).as("n_rows"),
        sum(when(col("val").isNull, col("c")).otherwise(0L)).as("n_nulls"),
        count(col("val")).as("n_distinct"),
        sum(when(col("val").isNotNull,
          length(col("val")).cast("long") * col("c")).otherwise(0L))
          .as("len_sum"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"),
        when(col("n_rows") > col("n_nulls"),
          dbl(dec(col("len_sum")) / (col("n_rows") - col("n_nulls"))))
          .as("avg_len"))
      .orderBy(col("col_name"))
  }
}
