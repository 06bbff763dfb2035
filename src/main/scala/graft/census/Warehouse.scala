package graft.census

import org.apache.spark.sql.{DataFrame, SaveMode}

/** R21/R22 warehouse-load semantics, re-expressed on the Spark catalog
  * (`Test_census_tract.py:210-260`: `create_redshift_table` creates the
  * table if absent, `copy_from_s3_to_redshift` COPY-appends into it;
  * the ZCTA pipeline's rebuild path overwrites).
  *
  * `saveAsTable` / the JDBC writer both carry the same create-if-absent
  * + Append/Overwrite distinction; the SORTKEY clause (R21) becomes the
  * range-partitioned sorted layout of [[Normalize.sortLikeWarehouse]]
  * applied before the write, which is the cluster-scale equivalent of a
  * sorted bulk load.
  *
  * `format`: `"parquet"` (default) lands in the session catalog;
  * `"jdbc"` writes to a real warehouse over the wire — the caller
  * supplies `url` (and `driver` if not auto-registered) via `options`,
  * and `table` becomes the JDBC `dbtable`. Both paths share the layout
  * and SaveMode semantics. Tested in `graft.WarehouseSpec` — the JDBC
  * leg against an embedded Derby database (the JDBC driver on the
  * local classpath; a Redshift/Postgres jar slots in identically).
  */
object Warehouse {
  def load(df: DataFrame, table: String, mode: SaveMode,
      sortKeys: Seq[String] = Seq.empty,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit = {
    val laid =
      if (sortKeys.nonEmpty) Normalize.sortLikeWarehouse(df, sortKeys) else df
    val writer = laid.write.mode(mode).options(options)
    format match {
      case "jdbc" => writer.format("jdbc").option("dbtable", table).save()
      case f => writer.format(f).saveAsTable(table)
    }
  }
}
