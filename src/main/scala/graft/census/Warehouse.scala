package graft.census

import org.apache.spark.sql.{DataFrame, SaveMode}

/** R21/R22 warehouse-load semantics, re-expressed on the Spark catalog
  * (`Test_census_tract.py:210-260`: `create_redshift_table` creates the
  * table if absent, `copy_from_s3_to_redshift` COPY-appends into it;
  * the ZCTA pipeline's rebuild path overwrites).
  *
  * `saveAsTable` carries the same create-if-absent + Append/Overwrite
  * distinction; the SORTKEY clause (R21) becomes the range-partitioned
  * sorted layout of [[Normalize.sortLikeWarehouse]] applied before the
  * write, which is the cluster-scale equivalent of a sorted bulk load.
  * A JDBC target would swap `format("parquet")` for `format("jdbc")`
  * with the same SaveMode semantics — not exercised here (zero-egress
  * environment), which is exactly why the semantics live behind this
  * one function. Unit-tested in `graft.WarehouseSpec`.
  */
object Warehouse {
  def load(df: DataFrame, table: String, mode: SaveMode,
      sortKeys: Seq[String] = Seq.empty): Unit = {
    val laid =
      if (sortKeys.nonEmpty) Normalize.sortLikeWarehouse(df, sortKeys) else df
    laid.write.mode(mode).format("parquet").saveAsTable(table)
  }
}
