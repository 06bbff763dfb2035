package graft.oracle

/** DuckDB oracle SQL, one entry per oracle-checked query in
  * graft.SparkEntry.queries. Written in portable ANSI-flavored DuckDB SQL
  * (SURVEY.md §2.2 determinism contract): explicit decimal casts, explicit
  * NULLS FIRST/LAST, fully tie-broken ORDER BY, column names identical to
  * the Spark side.
  */
object OracleSql {
  val all: Map[String, String] = Map(
    "agg_hash_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,6)) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(38,6)) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
