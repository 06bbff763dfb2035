package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.census.Normalize
import Util._

/** Category F — sorts / limits / top-k / census ops (SURVEY.md §2.2 F1-F6).
  *
  * F4-F6 are the reference-fidelity heart: geo domain
  * (`Test_census_tract.py:327`), union-by-name concat (`:398`,
  * `:171-175`), and the `EMPTYASNULL BLANKSASNULL` + sentinel cleaning of
  * the COPY contract (`:277`, SURVEY §1.2).
  */
object SortsCensus {

  /** F1: multi-key sort with explicit null placement. */
  def sortMultiNulls(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc,
        col("o_totalprice").desc_nulls_last, col("o_orderkey"))

  /** F2: global top-10 (plans as TakeOrderedAndProject — no full sort). */
  def limitTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(10)

  /** F13: OFFSET pagination as literal SQL (the C15 mechanism) — page
    * 5 of the F2 ranking (`LIMIT 10 OFFSET 40`): the SQL pagination
    * surface every API backend emits. Spark plans this as
    * TakeOrdered(limit = offset + k) and discards the prefix — fine
    * for shallow pages, but the cost grows LINEARLY with page depth
    * (page 10⁶ materializes 10⁷ rows on one node), which is why deep
    * pagination at 100 TB wants KEYSET continuation (`WHERE (sort key)
    * > last-seen … LIMIT k` — constant cost per page, and the sort
    * key is exactly this query's fully-tie-broken ORDER BY); the
    * ordering includes every output column because (l_orderkey,
    * l_linenumber) is not unique in the fixture — equal full rows
    * make any page boundary permutation-stable. */
  def sortPageOffset(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(graft.oracle.OracleSql.all("sort_page_offset"))
  }

  /** F3: top-3 orders per customer (window filter, tie-broken). */
  def topkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** F4: reference R11 verbatim — state FIPS domain 01..56 minus the
    * unassigned codes, zero-padded (`Test_census_tract.py:327`). */
  def censusStates(spark: SparkSession, sfDir: String): DataFrame =
    spark.range(1, 57)
      .filter(!col("id").isin(graft.census.Mapping.unassignedFips.toSeq: _*))
      .select(format_string("%02d", col("id")).as("fips"))
      .orderBy(col("fips"))

  /** F5: reference R5/R10 — two projections with different column subsets
    * union-by-name'd with NULL fill (pandas concat semantics). */
  def censusUnionByname(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val even = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val odd = c.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_acctbal"))
    Normalize.unionByNameAll(Seq(even, odd))
      .orderBy(col("c_custkey"))
  }

  /** F6: reference R22 + §1.2 — blank→NULL, sentinel→NULL, cast to
    * DECIMAL(18,0), over a string-ified projection of part with planted
    * blanks and sentinels. Finalized to BIGINT per the type contract. */
  def censusCleanCast(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        when(col("p_size") % 7 === 0, lit("  "))
          .when(col("p_size") % 11 === 0, lit("-666666666"))
          .otherwise(col("p_size").cast("string")).as("raw_size"))
      .select(col("p_partkey"), col("raw_size"),
        Normalize.cleanCast(col("raw_size")).cast("long").as("clean_size"))
      .orderBy(col("p_partkey"))

  /** F8: filtering over a sentinel-cleaned column (§1.2 suppressed-value
    * semantics) — the exact query shape the
    * [[graft.plans.SentinelCleanOptimization]] optimizer rule rewrites
    * into plain raw-column predicates. Sentinels are planted on the
    * p_size % 11 rows; the cleaned filter must reject them (NULL is
    * never > 25), and on a session configured with
    * `graft.GraftExtensions` the rewritten predicate reaches the scan
    * (pinned in `GraftExtensionsSpec`). */
  def censusSentinelFilter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        when(col("p_size") % 11 === 0, lit(-666666666L))
          .otherwise(col("p_size").cast("long")).as("raw_size"))
      .select(col("p_partkey"),
        Normalize.sentinelToNull(col("raw_size")).cast("long").as("clean_size"))
      .filter(col("clean_size").isNotNull && col("clean_size") > 25)
      .orderBy(col("p_partkey"))
}
