package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Categories H (scalar function library) and I (generators / UDFs) —
  * SURVEY.md §2.2 H1-H8, I1-I3. H8 (map fns) is unit-tested in
  * `graft.FnMapSpec`; I3 (custom Generator) in `graft.CharNGramsSpec`.
  * All expressions here are built-in Catalyst
  * expressions → whole-stage codegen, no UDF in the hot path except the
  * deliberately-tiny I2 capability proof.
  *
  * The battery mirrors the reference's string ops: upper/strip
  * (`Test_census_tract.py:48,352`), replace (`:352`), startswith (`:92`),
  * zero-pad (`:327`), join (`:161`).
  */
object Fns {

  /** H1: string battery over customer. */
  def fnString(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(col("c_name")).as("tr"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("pad"),
        substring(col("c_name"), 1, 8).as("sub"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
        translate(col("c_name"), "#", "_").as("tl"),
        length(col("c_name")).as("len"),
        col("c_name").startsWith("Customer").as("sw"),
        element_at(split(col("c_name"), "#"), 1).as("tok"))
      .orderBy(col("c_custkey"))

  /** H2: regex extract / replace-all over part. */
  def fnRegex(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "\\s+", "_").as("name_us"))
      .orderBy(col("p_partkey"))

  /** H3: date battery over orders (dayofweek: Spark is Sunday=1). */
  def fnDate(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      // sort below, date battery above (r21: the fn_try_arith
      // range-sampling rationale; o_orderkey unique)
      .select(col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        date_add(col("o_orderdate").cast("date"), 7).as("plus7"),
        last_day(col("o_orderdate").cast("date")).as("ld"),
        dayofweek(col("o_orderdate")).as("dow"))

  /** H10: calendar battery — add_months, quarter, ISO week, day-of-year,
    * year-trunc, month formatting, and a make_date reconstruction
    * round-trip. */
  def fnDate2(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      // sort below, calendar battery above (r21: the fn_try_arith
      // range-sampling rationale; o_orderkey unique)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        add_months(col("d"), 3).as("plus3m"),
        quarter(col("d")).as("qtr"),
        weekofyear(col("d")).as("isoweek"),
        dayofyear(col("d")).as("doy"),
        trunc(col("d"), "year").as("ystart"),
        date_format(col("d"), "yyyy-MM").as("ym"),
        make_date(year(col("d")), month(col("d")), dayofmonth(col("d"))).as("remade"))

  /** H4: math battery over part. Irrational results (ln) are rounded to
    * 4 dp — libm implementations agree far beyond that. */
  def fnMath(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        dbl(round(dec(col("p_retailprice")), 2)).as("r2"),
        abs(col("p_retailprice") - lit(1000.0d)).as("ab"),
        ceil(col("p_retailprice")).as("ce"),
        floor(col("p_retailprice")).as("fl"),
        pmod(col("p_partkey"), lit(7)).as("pm"),
        pow(col("p_size").cast("double"), lit(2.0d)).as("pw"),
        sqrt(col("p_size").cast("double")).as("sq"),
        round(log(col("p_size").cast("double") + lit(1.0d)), 4).as("lg"),
        greatest(col("p_retailprice"), lit(500.0d)).as("gr"),
        least(col("p_retailprice"), lit(500.0d)).as("le"))
      .orderBy(col("p_partkey"))

  /** H5: CASE WHEN bands + null functions over orders. */
  def fnCondNull(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      // sort below, band projection above (r21: the fn_try_arith
      // range-sampling rationale; o_orderkey unique)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        when(col("o_totalprice") < 50000.0d, "low")
          .when(col("o_totalprice") < 150000.0d, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        when(col("o_orderpriority").isNotNull, lit("has"))
          .otherwise(lit("none")).as("prio_flag"))

  /** H6: JSON — extract a field from the reference-R16-style props map,
    * rebuild a JSON string from a struct. */
  def fnJson(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull)
      // sort below the JSON rebuild (r21: the fn_try_arith
      // range-sampling rationale — the extract must stay below for the
      // filter, but to_json moves above; event_id unique)
      .orderBy(col("event_id"))
      .select(col("event_id"), col("k"),
        to_json(struct(col("event_type"), col("k"))).as("j"))

  /** H7: array battery over tokenized part names. */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .withColumn("toks", split(col("p_name"), " "))
      .select(col("p_partkey"),
        size(col("toks")).as("n_tok"),
        array_contains(col("toks"), "widget").as("has_widget"),
        element_at(col("toks"), 1).as("first_tok"),
        array_join(array_sort(col("toks")), ",").as("sorted_toks"))
      .orderBy(col("p_partkey"))

  /** H8: map functions — map construction, key filter on the
    * reference's `x-ratelimit` prefix (`Test_census_tract.py:92`),
    * sorted keys. The filtered map is serialized with to_json in the
    * final projection (scalar finals only — the driver's hasher can't
    * canonicalize MAP columns, round-4 verdict), which also makes the
    * query oracle-checkable via DuckDB's json_object. */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      // sort below, map battery above (r21: the fn_try_arith
      // range-sampling rationale; event_id unique)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        map_from_arrays(
          array(lit("x-ratelimit-remaining"), lit("content-type"), lit("etype")),
          array(col("event_id").cast("string"), lit("json"), col("event_type")))
          .as("headers"))
      .select(col("event_id"),
        array_join(array_sort(map_keys(col("headers"))), ",").as("keys_sorted"),
        to_json(map_filter(col("headers"), (k, _) => k.startsWith("x-ratelimit")))
          .as("ratelimit_json"))

  /** H9: bitwise battery over keys — AND/OR/XOR/NOT and shifts, the
    * primitives behind bitmap indexes and the SimHash/LSH band ops. */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("band"),
        col("p_partkey").bitwiseOR(lit(16L)).as("bor"),
        col("p_partkey").bitwiseXOR(col("p_size").cast("long")).as("bxor"),
        expr("shiftleft(p_size, 3)").as("shl"),
        expr("shiftright(p_partkey, 2)").as("shr"),
        bitwise_not(col("p_size")).as("bnot"),
        bit_count(col("p_partkey")).as("popcnt"))
      .orderBy(col("p_partkey"))

  /** I1: posexplode over the first 5 tokens of each document. */
  def genExplodePos(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 5)))
      .withColumnRenamed("col", "token")
      .orderBy(col("doc_id"), col("pos"))

  /** I5: OUTER explode — the generator-side silent-row-loss trap
    * (C21's theme at the generator): plain `explode` DROPS every row
    * whose array is empty, so a "parts and their matching words"
    * listing silently loses exactly the parts with no match — the
    * rows an audit most wants to see. `explode_outer` keeps them with
    * a NULL element. The match list (words starting with 'w') is
    * empty for a fixture-stable subset of parts, so both behaviors
    * are exercised; the higher-order `filter` runs interpreted, which
    * is fine on a dimension-sized column and exactly what the
    * MinHash/AnnLsh scaladocs say NOT to do on a fact-table hot path.
    * NULL sort position is explicit (Spark and DuckDB default
    * opposite). */
  def genExplodeOuter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        expr("filter(split(p_name, ' '), w -> w LIKE 'w%')").as("l"))
      .select(col("p_partkey"), size(col("l")).as("n_match"),
        explode_outer(col("l")).as("word"))
      .orderBy(col("p_partkey"), col("word").asc_nulls_first)

  /** I2: scalar UDF capability proof — FIPS zero-pad over the census
    * states domain (oracle uses lpad). */
  def udfScalarFips(spark: SparkSession, sfDir: String): DataFrame = {
    val padFips = udf((i: Long) => f"$i%02d")
    spark.range(1, 57)
      .filter(!col("id").isin(graft.census.Mapping.unassignedFips.toSeq: _*))
      .select(col("id"), padFips(col("id")).as("fips"))
      .orderBy(col("id"))
  }

  /** I3: custom Catalyst `Generator` (UDTF) — character trigrams of part
    * names via [[graft.functions.CharNGrams]], planned by Spark's own
    * `GenerateExec` (a true lateral operator, not a driver-side explode).
    * Oracle replicates the n-gram walk with a lateral range join. */
  def udtfGenerator(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.CharNGrams.register(spark)
    t(spark, sfDir, "part")
      .selectExpr("p_partkey", "char_ngrams(p_name)")
      .orderBy(col("p_partkey"), col("pos"))
  }

  /** I4: SQL TABLE function (`CREATE TEMPORARY FUNCTION … RETURNS
    * TABLE … RETURN SELECT`, Spark 4) applied LATERALLY — the
    * declarative counterpart of I3's compiled Catalyst Generator:
    * the relation-producing body is SQL text Catalyst inlines and
    * plans as an ordinary generate (I1's posexplode shape), so a
    * shared "explode this column like X" library ships as SQL, gets
    * every optimizer rewrite, and needs no jar — the table-function
    * face of H14's argument. The lateral correlation (the function's
    * arguments come from each outer row) is the part I1's direct
    * select can't express declaratively. */
  def fnSqlUdtf(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents").createOrReplaceTempView("documents_i4")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_head_tokens(
        |  s STRING, n INT) RETURNS TABLE (pos INT, tok STRING)
        |RETURN SELECT posexplode(slice(split(s, ' '), 1, n))
        |""".stripMargin)
    spark.sql(
      """SELECT doc_id, t.pos, t.tok
        |FROM documents_i4, LATERAL graft_head_tokens(text, 3) t
        |ORDER BY doc_id, t.pos""".stripMargin)
  }

  /** H11: URL parsing battery — the host / path / query / parameter
    * extraction a web-corpus pipeline runs before domain-level
    * filtering, source attribution, and per-site mixing. The fixture
    * carries no URL column, so a deterministic URL is synthesized per
    * order (pure function of the row — the K35/K49 injection pattern),
    * then dissected with Spark's native `parse_url` (codegen'd,
    * java.net-grade parsing). The oracle mirrors with anchored
    * regexes — exact for the synthesized shape, which is the point of
    * controlling the input. One narrow projection, no shuffle before
    * the output sort. */
  /** H12: the Spark 4 VARIANT surface — semi-structured data as a
    * first-class type instead of per-access string re-parsing:
    * `parse_json` decodes the props JSON ONCE into the binary variant
    * encoding, then `try_variant_get` answers typed path lookups
    * (int AND string off the same variant — the cross-type access
    * `get_json_object` can't give without a second parse),
    * `schema_of_variant` reports the inferred shape, a missing path
    * yields NULL (not an error), and `try_parse_json` absorbs a
    * malformed document as NULL (the PERMISSIVE discipline of A11 at
    * the cell level). At 100 TB the variant encoding is the
    * difference between parsing the JSON once at ingest and parsing
    * it per predicate. Oracle: DuckDB json_extract mirrors the typed
    * lookups; the shape string and malformed-probe verdicts are
    * fixture-constant CASE mirrors. */
  def fnVariant(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      // sort below, variant battery above (r21: the fn_try_arith
      // range-sampling rationale; event_id unique)
      .select(col("event_id"), col("props"))
      .orderBy(col("event_id"))
      .withColumn("v", parse_json(col("props")))
      .select(col("event_id"),
        try_variant_get(col("v"), "$.k", "int").as("k"),
        try_variant_get(col("v"), "$.k", "string").as("k_str"),
        try_variant_get(col("v"), "$.missing", "int").as("missing_k"),
        schema_of_variant(col("v")).as("vtype"),
        // the malformed-document probe drives a caught EXCEPTION per
        // evaluation — probing every row cost ~1 s of pure
        // throw/catch at sf0.1, so the absorb-don't-fail semantics
        // are sampled on every 100th event (NULL elsewhere); at
        // 100 TB a per-row exception probe would be a real CPU line
        // item, which is itself the lesson
        when(col("event_id") % 100 === 0,
          try_parse_json(concat(lit("{"), col("props"))).isNull)
          .as("bad_is_null"))

  /** H11: URL dissection. ONE `parse_url` call per row (the QUERY-key
    * extraction, the piece worth a real URL parser); host/path/query/
    * protocol come from codegen'd substring arithmetic over the
    * scheme://host/path?query shape — the previous six-parse_url form
    * re-ran the full java.net URI parse per output column, 5 of 6
    * redundantly (~3× the row cost; cosmetic at sf0.1, a linear CPU
    * line item at 100 TB — round-14 advice). */
  def fnUrl(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      // declared sort below, url dissection above (r21: the range
      // sampling pass otherwise re-runs the whole string battery —
      // the fn_try_arith rationale; o_orderkey is unique so the row
      // order is unchanged)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .withColumn("url", concat(
        lit("https://www.shop"), (col("o_orderkey") % 5).cast("string"),
        lit(".example.com/cat/"), (col("o_custkey") % 7).cast("string"),
        lit("/item?id="), col("o_orderkey").cast("string"),
        lit("&pri="), regexp_replace(col("o_orderpriority"), " ", "+")))
      // pre_q = everything before '?'; proto = before '://';
      // host = first '/'-segment after '://'; path = the remainder of
      // pre_q past proto + "://" + host (substr is 1-indexed)
      .withColumn("pre_q", substring_index(col("url"), "?", 1))
      .withColumn("proto", substring_index(col("url"), "://", 1))
      .withColumn("host",
        substring_index(expr("substr(url, length(proto) + 4)"), "/", 1))
      .select(col("o_orderkey"),
        col("host"),
        expr("substr(pre_q, length(proto) + 3 + length(host) + 1)").as("path"),
        expr("substr(url, length(pre_q) + 2)").as("query"),
        expr("parse_url(url, 'QUERY', 'id')").as("q_id"),
        col("proto"))

  /** H19: higher-order array lambdas — transform / filter / aggregate
    * / exists / forall over the tokenized part name, the SQL-surface
    * battery for the lambda functions (every output scalar and
    * integer-exact, so cross-engine parity is exact). CAVEAT baked
    * into the suite's own guidance: lambda bodies run INTERPRETED
    * (no codegen) — fine over ≤5-token arrays in a projection, wrong
    * on a hot path (the MinHash/AnnLsh scaladocs document the
    * codegen'd explode+agg replacements); this query exists to pin
    * the capability, priced where it is cheap. */
  def fnLambda(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"), split(col("p_name"), " ").as("toks"))
      .select(col("p_partkey"),
        size(filter(col("toks"), t => length(t) > 4)).cast("long")
          .as("n_long"),
        aggregate(col("toks"), lit(0),
          (acc, t) => acc + length(t)).cast("long").as("len_sum"),
        array_join(transform(col("toks"), t => upper(t)), "-")
          .as("upper_join"),
        exists(col("toks"), t => t === "widget").as("has_widget"),
        forall(col("toks"), t => length(t) >= 3).as("all_min3"))
      .orderBy(col("p_partkey"))

  /** H13: the Spark 4 COLLATION surface — case-insensitive grouping
    * as a TYPE property (`collate(s, 'UTF8_LCASE')`), not an
    * expression rewrite: synthesized case variants of `p_brand` (raw/
    * UPPER/lower) collapse into one group when the grouping key
    * carries the UTF8_LCASE collation, while the binary distinct
    * count inside each group still sees every written form. At scale
    * the distinction matters because collation rides the type through
    * every operator — joins, aggregations, and shuffles hash the
    * COLLATION KEY (no `lower()` wrapper to forget on one side of a
    * join, the classic silent-mismatch bug). Output columns are plain
    * binary-collation strings (the canonical form is the binary MIN —
    * deterministic in both engines); the oracle mirrors with
    * `GROUP BY lower()`, equivalent on this ASCII domain. */
  def fnCollation(spark: SparkSession, sfDir: String): DataFrame = {
    val b = t(spark, sfDir, "part").select(col("p_brand").as("b"))
    val variants = b
      .union(b.select(upper(col("b"))))
      .union(b.select(lower(col("b"))))
    variants
      .groupBy(expr("collate(b, 'UTF8_LCASE')"))
      .agg(min(col("b")).as("canon"), count(lit(1)).as("n"),
        countDistinct(col("b")).as("n_forms"))
      .select(col("canon"), col("n"), col("n_forms"))
      .orderBy(col("canon"))
  }

  /** H16: the timezone surface — `from_utc_timestamp` against IANA
    * zones: event time is stored as UTC instants (the only sane 100-TB
    * contract — storing local wall time loses an hour of data every
    * DST fall-back), and localization happens AT READ in the query.
    * Per event: the New York local date and hour, the Tokyo hour, and
    * the NY UTC-offset in minutes (−300 EST / −240 EDT — the offset
    * column makes the DST transition itself visible and oracle-checked
    * when the fixture spans it). Finals are DATE/INT — never raw
    * TIMESTAMP out (the driver hasher contract); the offset is derived
    * by integer epoch subtraction, where the sub-second fraction
    * cancels before any division. Oracle: DuckDB ICU
    * `AT TIME ZONE 'UTC' AT TIME ZONE <zone>` double-hop. */
  def fnTimezone(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      // sort below, timezone battery above (r21: the fn_try_arith
      // range-sampling rationale; event_id unique)
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        col("ts"),
        from_utc_timestamp(col("ts"), "America/New_York").as("ny"),
        from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tky"))
      .select(col("event_id"),
        to_date(col("ny")).as("ny_date"),
        hour(col("ny")).as("ny_hour"),
        hour(col("tky")).as("tokyo_hour"),
        ((unix_timestamp(col("ny")) - expr("unix_micros(ts) DIV 1000000"))
          / 60).cast("int").as("ny_offset_min"))

  /** H15: the try_* ANSI-safe arithmetic surface — Spark 4 runs ANSI
    * mode by default, where division by zero, numeric overflow, and
    * bad casts THROW and kill the job; `try_divide`/`try_add`/
    * `try_cast`/`try_element_at` return NULL instead, which is the
    * production posture for dirty data at 100 TB (one malformed cell
    * must not kill a load — A11's PERMISSIVE discipline at the
    * expression level, with the NULL observable per cell instead of
    * per record). Each probe is deterministic: a zero divisor every
    * 5th key, a non-numeric string every 3rd, a guaranteed BIGINT
    * overflow every odd key, an out-of-bounds list index when the
    * split yields one part. Oracle: DuckDB divides-to-NULL natively
    * and mirrors the rest with TRY_CAST / list indexing / a CASE for
    * the analytically-known overflow. */
  /** H18: calendar battery — the date-dimension derivations every
    * warehouse calendar carries, chosen for CROSS-ENGINE SEMANTIC
    * AGREEMENT and pinned by the oracle where engines are known to
    * diverge elsewhere: `last_day` month-end detection, `quarter`,
    * ISO `weekofyear` (both engines are ISO-8601 — week 1 holds the
    * first Thursday; early-January dates can belong to week 52/53 of
    * the PRIOR year, which is why n_distinct weeks per quarter is a
    * real check, not a constant 13), ISO day-of-week (Spark's
    * `dayofweek` is 1=Sunday while DuckDB's is 0=Sunday — the battery
    * uses Spark `weekday`+1 ≡ DuckDB `isodow`, the unambiguous ISO
    * numbering), and `dayofyear`. Deliberately NO month arithmetic on
    * month-ends: Spark `add_months` preserves end-of-month while
    * interval addition clamps — a semantic fork this battery's
    * scaladoc records and every query here avoids. */
  def fnCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date").as("d"))
      .groupBy(year(col("d")).cast("bigint").as("yr"),
        quarter(col("d")).cast("bigint").as("q"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("d") === last_day(col("d")), 1L).otherwise(0L))
          .as("n_monthend"),
        countDistinct(weekofyear(col("d"))).as("n_weeks"),
        sum(when(weekday(col("d")) + 1 === 1, 1L).otherwise(0L))
          .as("n_mondays"),
        min(dayofyear(col("d")).cast("bigint")).as("min_doy"),
        max(dayofyear(col("d")).cast("bigint")).as("max_doy"))
      .orderBy(col("yr"), col("q"))
  }

  /** H17: TRY_CAST ingestion battery — the safe-parse posture every
    * raw-string load needs: `try_cast` yields NULL on malformed input
    * instead of failing the job (one bad row in a 100 TB load must
    * not kill the stage — and a plain CAST under ANSI mode does
    * exactly that). Dirt is synthesized deterministically from CLEAN
    * string renderings: integer keys with a trailing 'x' every 7th,
    * an impossible calendar date every 11th, 'N/A' cents every 13th —
    * note the cents column is stringified from the exact BIGINT, never
    * from the DOUBLE (double→string formatting is engine-specific;
    * integer and date renderings are not). One pass: per-rule failure
    * counts plus aggregates over the successfully parsed values —
    * parse + audit ride the same map-side-combined aggregation. */
  def fnTryCast(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = t(spark, sfDir, "orders").select(
      when(col("o_orderkey") % 7 === 0,
        concat(col("o_orderkey").cast("string"), lit("x")))
        .otherwise(col("o_orderkey").cast("string")).as("s_int"),
      when(col("o_orderkey") % 11 === 0, lit("2020-13-45"))
        .otherwise(col("o_orderdate").cast("date").cast("string"))
        .as("s_date"),
      when(col("o_orderkey") % 13 === 0, lit("N/A"))
        .otherwise(cents(col("o_totalprice")).cast("string")).as("s_cents"))
    raw.select(
        expr("try_cast(s_int AS BIGINT)").as("i"),
        expr("try_cast(s_date AS DATE)").as("d"),
        expr("try_cast(s_cents AS BIGINT)").as("c"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("i").isNull, 1L).otherwise(0L)).as("n_bad_int"),
        sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_bad_date"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_bad_cents"),
        sum(col("i")).as("sum_int"),
        min(col("d")).as("min_date"),
        max(col("d")).as("max_date"),
        sum(col("c")).as("sum_cents"))
  }

  def fnTryArith(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderkey") % 5).as("d"),
        concat(when(col("o_orderkey") % 3 === 0, lit("x"))
            .otherwise(lit("")),
          (col("o_orderkey") % 100).cast("string")).as("s"))
      // declared output sort FIRST, heavy try_* projection ABOVE it
      // (r21, guide §1.2/§7.2): a global ORDER BY plans a range
      // exchange whose partitioner SAMPLES its child — with the
      // expensive expressions below the sort, every try_/split call
      // ran twice (once in the sampling pass, once for real: two
      // ~700 ms stages at sf0.1). The sort key is the unique raw
      // o_orderkey, so projecting after the sort preserves the exact
      // row order, evaluates each expression once, and the exchange
      // carries 3 narrow columns instead of the computed five.
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        expr("try_divide(CAST(o_orderkey AS DOUBLE), CAST(d AS DOUBLE))")
          .as("q"),
        expr("try_cast(s AS INT)").as("n"),
        // the overflow arm is exception-driven inside Spark
        // (Math.addExact throws, try catches) — probing every row
        // cost 3.9 s of pure throw/catch at sf0.1, so it samples
        // every 101st key (odd modulus: the sample keeps both parities
        // → both outcomes); the H12 bad_is_null lesson again
        expr("""CASE WHEN o_orderkey % 101 = 0
               |THEN try_add(CAST(9223372036854775807 AS BIGINT),
               |             o_orderkey % 2) END""".stripMargin)
          .as("ov"),
        expr("try_element_at(split(s, 'x'), 2)").as("second_part"))

  /** H14: the Spark 4 SQL UDF surface — `CREATE TEMPORARY FUNCTION …
    * RETURNS … RETURN <expr>` (SQL-defined, not Scala-closure): the
    * body is INLINED into the calling plan by Catalyst, so unlike a
    * Scala/Python UDF it stays inside whole-stage codegen, keeps
    * filter/pushdown transparency, and costs nothing over writing the
    * expression by hand — which is why a shared business-logic library
    * at 100 TB ships as SQL UDFs, not closures (I2 pins the closure
    * path and its registration contract; this pins the SQL path). The
    * function computes the discounted line price; the aggregate is the
    * Util.decSumDbl discipline spelled in SQL. Oracle: the SAME query
    * with the UDF body inlined by hand — proving the inlining is
    * semantically exact. */
  def fnSqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem_h14")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
        |  p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1.0d - d)
        |""".stripMargin)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(graft_disc_price(l_extendedprice, l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem_h14
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** H20: EDIT-DISTANCE battery — the fuzzy-matching scalar surface
    * (entity resolution, typo-tolerant lookup, the K38 dedup kernel
    * as a reporting function) over deterministic same-row pairs, so
    * both engines score identical inputs: `levenshtein(name,
    * reverse(name))` (palindromic distance), `levenshtein(name,
    * upper(name))` (= alphabetic char count — a known closed form
    * both engines must hit), and the THRESHOLDED 3-arg form against
    * the brand string (Spark returns −1 beyond the cap — the banded
    * early-exit DP that keeps a 100 TB fuzzy probe from paying full
    * O(len²) on obvious non-matches; the oracle spells the same
    * semantics as a CASE). Aggregated per brand in one
    * map-side-combined pass — scalar battery, reporting-cardinality
    * output. */
  def fnEditDist(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part")
      .select(col("p_brand"), col("p_name"),
        levenshtein(col("p_name"), reverse(col("p_name"))).as("lv_rev"),
        levenshtein(col("p_name"), upper(col("p_name"))).as("lv_up"),
        levenshtein(col("p_name"), col("p_brand"), 10).as("lv_brand_10"))
    p.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("lv_rev")).as("sum_lv_rev"),
        max(col("lv_rev")).cast("long").as("max_lv_rev"),
        sum(col("lv_up")).as("sum_lv_up"),
        sum(when(col("lv_brand_10") >= 0, 1L).otherwise(0L))
          .as("n_within_10"))
      .orderBy(col("p_brand"))
  }
}
