package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Category C — joins (SURVEY.md §2.2 C1-C10).
  *
  * Scale notes: C1/C3 broadcast the small side explicitly (dimension
  * tables stay under the broadcast threshold even at 100 TB fact scale);
  * C2 is the canonical shuffle (sort-merge) fact-fact join — both sides
  * hash-partition on the join key, AQE handles skew; C9 is an equi-join
  * on user_id with a range residual (never a cross product); C10 avoids a
  * join entirely — the as-of lookup is a single window pass (one shuffle
  * on user_id), the scalable shape for "latest prior event".
  */
object Joins {

  /** C1: customer ⋈ nation ⋈ region with explicit broadcast of the dims. */
  def joinBroadcastInner(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"), "inner")
      .join(broadcast(t(spark, sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"), "inner")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("c_custkey"))

  /** C2: orders ⋈ lineitem on orderkey (shuffle join), revenue per order. */
  def joinShuffleInner(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy(col("o_orderkey"))
      .agg(
        dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderkey"))

  /** C3: all customers left-join orders; COUNT(o_orderkey) is the
    * NULL-safe order count (0 for customers with no orders). */
  def joinLeftOuter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  /** C4: supplier full-outer customer on nationkey (both null sides). */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier")
      .join(t(spark, sfDir, "customer"),
        col("s_nationkey") === col("c_nationkey"), "full")
      .select(col("s_suppkey"), col("s_nationkey"), col("c_custkey"),
        col("c_nationkey"))
      .orderBy(asc_nulls_first("s_suppkey"), asc_nulls_first("c_custkey"))

  /** C45: the scale-safe full-outer form (round-16 verdict #3) — C4's
    * declared shape is a many-to-many fan-out on a 25-key column whose
    * OUTPUT grows O(sf²); this companion aggregates BOTH sides first
    * (supplier / customer balances rolled up per (nationkey,
    * ⌊acctbal/1000⌋ band)) and full-outer joins the two aggregate
    * frames, so the join output is bounded by the key-space
    * cardinality (~25 × ~11 rows) at ANY scale factor. Band coverage
    * differs naturally between the two sides, so both NULL arms are
    * genuinely exercised. Presentation is top-50 by combined balance —
    * plans TakeOrderedAndProject, never a global sort of a fan-out.
    *
    * Scale shape: two map-side partial aggs (each side shuffles only
    * (key, partial) rows), one join of two ~300-row frames, one
    * TakeOrdered. Survives 100× trivially — the only data-volume work
    * is the two scans. */
  def joinFullOuterTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val s = t(spark, sfDir, "supplier")
      .groupBy(col("s_nationkey").as("snk"),
        floor(col("s_acctbal") / lit(1000)).cast("long").as("sband"))
      .agg(count(lit(1)).as("n_supp"),
        sum(cents(col("s_acctbal"))).cast("long").as("supp_cents"))
    val c = t(spark, sfDir, "customer")
      .groupBy(col("c_nationkey").as("cnk"),
        floor(col("c_acctbal") / lit(1000)).cast("long").as("cband"))
      .agg(count(lit(1)).as("n_cust"),
        sum(cents(col("c_acctbal"))).cast("long").as("cust_cents"))
    s.join(c, col("snk") === col("cnk") && col("sband") === col("cband"),
        "full")
      .select(
        coalesce(col("snk"), col("cnk")).as("nationkey"),
        coalesce(col("sband"), col("cband")).as("band"),
        col("n_supp"), col("supp_cents"), col("n_cust"), col("cust_cents"))
      .orderBy(
        (coalesce(col("supp_cents"), lit(0L))
          + coalesce(col("cust_cents"), lit(0L))).desc,
        col("nationkey"), col("band"))
      .limit(50)
  }

  /** C5: customers with ≥1 order (EXISTS → left-semi). */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** C6: customers with no orders (NOT EXISTS → left-anti). */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** C7: region × nation cartesian (both tiny; plans as BNLJ). */
  def joinCross(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .crossJoin(t(spark, sfDir, "nation"))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
        col("n_name"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  /** C8: theta join — equi on nationkey with an inequality residual
    * (plans as SMJ/BHJ with residual filter, never a cross product). */
  def joinTheta(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier")
      .join(t(spark, sfDir, "customer"),
        col("s_nationkey") === col("c_nationkey")
          && col("s_acctbal") > col("c_acctbal"), "inner")
      .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"),
        col("c_acctbal"))
      .orderBy(col("s_suppkey"), col("c_custkey"))

  /** C47: the aggregate-first companion to [[joinTheta]] — the same
    * business question (which supplier balances dominate which customer
    * balances, per nation) answered WITHOUT materializing the
    * quadratic pair set. C8's output is itself O(rows²/nations): ~half
    * the per-nation fan-out passes the `s_acctbal > c_acctbal`
    * residual, so at recrawl scale the ANSWER melts even when the plan
    * is fine (the r17 sf1 audit measured 8.2× for 10× data; sf10 was
    * 133.7×). This rung reduces the relation per nation instead: merge
    * suppliers and customers into one stream, sort by balance inside
    * the nation (ONE hash exchange on nationkey, O(n log n) per
    * nation), and read every pair statistic off running windows —
    *   n_pairs   = Σ_suppliers |{customers below}| (running customer
    *               count; strict `>` enforced by the tie order:
    *               suppliers sort BEFORE equal-balance customers),
    *   min_gap   = min_s (s − max{c < s})  — each supplier's nearest
    *               dominated customer is the running customer max,
    *   max_gap   = max_s (s − min{c < s})  — the running customer min.
    * Identical doubles subtracted as in the pair form ⇒ exact oracle
    * parity, while output is 25 rows at ANY scale and nothing
    * quadratic ever exists, even transiently. This is the C45
    * discipline applied to C8's own question (VERDICT r18 item 1). */
  /** Balance-range segment count for [[joinThetaAgg]]'s running
    * windows (r21 optimization): the per-nation window is ONE task per
    * nation — 25 tasks total, each sorting n/25 rows, the
    * single-partition tail behind C47's 15.2× sf100 decade
    * (BENCH_sf100_fork.json). Segmenting by VALUE RANGE turns it into
    * nations × segments parallel window tasks plus a tiny
    * (nations × segments)-row prefix frame — the classic segmented
    * prefix-sum. Equal balances always share a segment (the segment is
    * a function of the value), so "earlier segment" means STRICTLY
    * smaller balance and the supplier-before-equal-customer tie rule
    * stays segment-local; every per-supplier running statistic
    * recomposes EXACTLY (sum of longs, max/min selection over the
    * same doubles), keeping the oracle hash unchanged at every scale. */
  val ThetaAggSegments = 32

  def joinThetaAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val s = t(spark, sfDir, "supplier")
      .select(col("s_nationkey").as("nk"), col("s_acctbal").as("bal"),
        lit(0).as("is_cust"))
    val c = t(spark, sfDir, "customer")
      .select(col("c_nationkey").as("nk"), col("c_acctbal").as("bal"),
        lit(1).as("is_cust"))
    // seg is derived from the VALUE (TPC-H acctbal spans
    // [-999.99, 9999.99]; out-of-range values still map monotonically),
    // so segment order refines balance order
    val merged = s.unionByName(c)
      .withColumn("seg",
        floor((col("bal") + lit(1000.0))
          / lit(11000.0 / ThetaAggSegments)).cast("int"))
    // is_cust ASC at equal balance ⇒ a supplier row's frame never
    // includes an equal-balance customer (strict inequality for free)
    val w = Window.partitionBy(col("nk"), col("seg"))
      .orderBy(col("bal"), col("is_cust"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(nation, segment) customer summary, then running prefixes
    // over the STRICTLY EARLIER segments — nations × segments rows,
    // broadcast back onto the fact-side window pass
    val wSeg = Window.partitionBy(col("nk")).orderBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = merged.groupBy(col("nk"), col("seg"))
      .agg(sum(col("is_cust")).cast("long").as("c_n"),
        max(when(col("is_cust") === 1, col("bal"))).as("c_max"),
        min(when(col("is_cust") === 1, col("bal"))).as("c_min"))
      .select(col("nk"), col("seg"),
        coalesce(sum(col("c_n")).over(wSeg), lit(0L)).as("pfx_n"),
        max(col("c_max")).over(wSeg).as("pfx_max"),
        min(col("c_min")).over(wSeg).as("pfx_min"))
    val perSupplier = merged
      .select(col("nk"), col("seg"), col("bal"), col("is_cust"),
        sum(col("is_cust")).over(w).as("seg_below"),
        max(when(col("is_cust") === 1, col("bal"))).over(w)
          .as("seg_max_below"),
        min(when(col("is_cust") === 1, col("bal"))).over(w)
          .as("seg_min_below"))
      .join(broadcast(prefixes), Seq("nk", "seg"))
      .select(col("nk"), col("bal"), col("is_cust"),
        (col("seg_below") + col("pfx_n")).as("cust_below"),
        // Spark greatest/least skip NULLs: a segment-local or prefix
        // side with no customers yet drops out of the selection
        greatest(col("seg_max_below"), col("pfx_max"))
          .as("cust_max_below"),
        least(col("seg_min_below"), col("pfx_min"))
          .as("cust_min_below"))
      .filter(col("is_cust") === 0 && col("cust_below") > 0)
    perSupplier
      .groupBy(col("nk"))
      .agg(sum(col("cust_below")).cast("long").as("n_pairs"),
        min(col("bal") - col("cust_max_below")).as("min_gap"),
        max(col("bal") - col("cust_min_below")).as("max_gap"))
      .join(broadcast(t(spark, sfDir, "nation")),
        col("nk") === col("n_nationkey"))
      .select(col("n_name"), col("n_pairs"), col("min_gap"),
        col("max_gap"))
      .orderBy(col("n_name"))
  }

  /** C9: interval range join over events — clicks within 5 minutes after
    * a view by the same user. Equi on user_id + range residual. */
  def joinRangeInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events")
    val e1 = e.filter(col("event_type") === "view").alias("e1")
    val e2 = e.filter(col("event_type") === "click").alias("e2")
    e1.join(e2,
        col("e1.user_id") === col("e2.user_id")
          && col("e2.ts") >= col("e1.ts")
          && col("e2.ts") < col("e1.ts") + expr("interval 5 minutes"))
      .select(col("e1.event_id").as("view_id"),
        col("e2.event_id").as("click_id"),
        (unix_micros(col("e2.ts")) - unix_micros(col("e1.ts"))).as("gap_us"))
      .orderBy(col("view_id"), col("click_id"))
  }

  /** C16: the SAME band semantics as [[joinRangeInterval]], through
    * the native whole-operator path — [[graft.plans.RangeJoin]], a
    * custom LogicalPlan planned by [[graft.plans.RangeJoinStrategy]]
    * to a co-partitioned sliding-window band merge
    * ([[graft.plans.RangeJoinExec]]). The stock C9 plan is an SMJ
    * with the band as a residual filter — every same-user pair
    * materializes before the filter, O(group²) per user, the one §2.2
    * join whose stock plan degrades quadratically as per-user history
    * grows. The native merge is O(n + output) with buffer memory
    * bounded by one 5-minute window. Checked against the identical
    * DuckDB oracle as C9, and row-for-row against C9 in
    * `RangeJoinSpec`. */
  def joinRangeNative(spark: SparkSession, sfDir: String): DataFrame = {
    val lhs = t(spark, sfDir, "events")
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    // a separate scan: fresh attribute ids for the self-join's right
    // side, with columns pre-renamed (the standard self-join contract)
    val rhs = t(spark, sfDir, "events")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
      .filter(col("r_event_type") === "click")
      .select(col("r_user_id"), col("r_ts"), col("r_event_id"))
    graft.plans.RangeJoins.joinRange(lhs, rhs,
        Seq("user_id"), Seq("r_user_id"), "ts", "r_ts",
        lower = 0L, upper = 5L * 60 * 1000000)
      .select(col("event_id").as("view_id"),
        col("r_event_id").as("click_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("view_id"), col("click_id"))
  }

  /** C11: the SAME as-of semantics as [[joinAsof]], through the native
    * whole-operator path — [[graft.plans.AsOfJoin]], a custom
    * LogicalPlan planned by [[graft.plans.AsOfJoinStrategy]] to a
    * co-partitioned single-pass merge ([[graft.plans.AsOfJoinExec]]).
    * Against the C10 window trick this needs no union and carries no
    * window state; probe (purchases) and build (all events) shuffle
    * once each and merge forward with O(1) state. Checked against the
    * identical DuckDB oracle as C10, and row-for-row against C10 in
    * `AsOfJoinSpec`. */
  def joinAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val lhs = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // a separate scan: fresh attribute ids for the self-join's right
    // side, with columns pre-renamed (the standard self-join contract)
    val rhs = t(spark, sfDir, "events")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
    graft.plans.AsOf.joinAsOf(lhs, rhs,
        Seq("user_id"), Seq("r_user_id"),
        Seq("ts", "event_id"), Seq("r_ts", "r_event_id"))
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("prev_event_id"),
        col("r_event_type").as("prev_event_type"),
        (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** C13: the native as-of join with a TOLERANCE bound (pandas
    * `merge_asof(tolerance=...)`): same latest-prior-event semantics as
    * [[joinAsofNative]], but a nearest event farther than 6 hours
    * yields NULLs — never a farther fallback (the "stale quote is no
    * quote" contract of financial as-of joins). The bound is checked
    * on the matched candidate inside the single merge pass — no extra
    * shuffle, no post-filter pass. Oracle: the C10 window CTE with the
    * gap predicate masking the match columns. */
  def joinAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 6L * 3600 * 1000000 // 6 h in the ts column's micros
    val lhs = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val rhs = t(spark, sfDir, "events")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
    graft.plans.AsOf.joinAsOf(lhs, rhs,
        Seq("user_id"), Seq("r_user_id"),
        Seq("ts", "event_id"), Seq("r_ts", "r_event_id"),
        tolerance = Some(tolUs))
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("prev_event_id"),
        col("r_event_type").as("prev_event_type"),
        (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** C14: the native as-of join in the FORWARD direction (pandas
    * `merge_asof(direction='forward')`): per purchase, the EARLIEST
    * event strictly after it — the "next touch" attribution query.
    * Same single merge pass; forward needs no candidate state at all
    * (the first not-yet-consumed right row past the probe is the
    * answer). Oracle: the C10 CTE with lead() in place of lag(). */
  def joinAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val lhs = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val rhs = t(spark, sfDir, "events")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
    graft.plans.AsOf.joinAsOf(lhs, rhs,
        Seq("user_id"), Seq("r_user_id"),
        Seq("ts", "event_id"), Seq("r_ts", "r_event_id"),
        direction = "forward")
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("next_event_id"),
        col("r_event_type").as("next_event_type"),
        (unix_micros(col("r_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** C17: the native as-of join in the NEAREST direction (pandas
    * `merge_asof(direction='nearest')`, completing the direction
    * matrix): per purchase, the strictly-before or strictly-after
    * event with the smaller time gap, ties preferring backward — the
    * "closest sensor reading" alignment shape. Same single merge pass;
    * nearest carries ONE extra right-row buffer beyond backward's
    * (the tuple-equal rows a later probe still needs). The match side
    * is re-derived from the output tuple ordering so the oracle can
    * check the tie rule, not just the chosen row. */
  def joinAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val lhs = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val rhs = t(spark, sfDir, "events")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("event_type").as("r_event_type"))
    graft.plans.AsOf.joinAsOf(lhs, rhs,
        Seq("user_id"), Seq("r_user_id"),
        Seq("ts", "event_id"), Seq("r_ts", "r_event_id"),
        direction = "nearest")
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("near_event_id"),
        col("r_event_type").as("near_event_type"),
        abs(unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"),
        when(col("r_event_id").isNull, lit(null).cast("string"))
          .when(col("r_ts") < col("ts") ||
            (col("r_ts") === col("ts") && col("r_event_id") < col("event_id")),
            lit("backward"))
          .otherwise(lit("forward")).as("side"))
      .orderBy(col("event_id"))
  }

  /** C15: the raw-SQL surface — a TPC-H Q3-shaped shipping-priority
    * query run through `spark.sql` over registered temp views, with
    * the LITERALLY IDENTICAL SQL text the DuckDB oracle executes
    * ([[graft.oracle.OracleSql]] is the single source): the engine's
    * SQL entry point is itself covered, not just the DataFrame API.
    * Catalyst plans raw SQL and DataFrame code through the same
    * optimizer, so the dim filter broadcasts and the fact-fact join
    * shuffles exactly as in C1/C2. */
  def sqlTpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q3"))
  }

  /** C18: TPC-H Q5 as literal SQL (same mechanism as C15) — the 6-way
    * snowflake join (region→nation→supplier + customer→orders→lineitem
    * meeting on the co-nationality predicate) that exercises
    * Catalyst's JOIN ORDERING and dim-broadcast decisions at once:
    * the optimizer must push the region filter through nation, chain
    * the three tiny dims as broadcasts, and leave only the fact-fact
    * orders⋈lineitem as a shuffle — the plan shape a 100 TB star
    * schema lives or dies by. Exact-decimal revenue, DOUBLE final. */
  def sqlTpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("region", "nation", "supplier", "customer", "orders", "lineitem")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q5"))
  }

  /** C23: TPC-H Q7 (volume shipping) as literal SQL (the C15
    * mechanism) — the bidirectional-pair join predicate the Q5 chain
    * lacks: nation is joined TWICE (supplier's n1, customer's n2)
    * under a DISJUNCTIVE pair filter `(n1=A AND n2=B) OR (n1=B AND
    * n2=A)`, which Catalyst cannot push to either scan alone — it
    * must plan both nation broadcasts and evaluate the pair residual
    * on the joined stream, the classic "trade between two countries"
    * shape; plus a derived-table projection (the `shipping` subquery)
    * and a year extraction in the group key. Exact-decimal volume,
    * DOUBLE final; years cast to BIGINT in the shared text so both
    * engines agree on the column type. */
  def sqlTpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("nation", "supplier", "customer", "orders", "lineitem")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q7"))
  }

  /** C44: the COUNT-bug decorrelation shape as literal shared SQL —
    * a correlated scalar COUNT in the SELECT list must return 0 (not
    * NULL) for outer rows with NO matching inner rows: naive
    * decorrelation into an outer join + COUNT yields NULL for the
    * empty group, the textbook rewrite bug (Kim 1982's unnesting
    * trap). Catalyst handles it with a post-join NULL→0 projection;
    * this query pins that the handled plan and DuckDB agree on every
    * customer, including order-less ones — plus the same subquery
    * under COALESCE in a filter, where the bug would silently drop
    * rows instead of mis-reporting them. */
  def sqlCountBug(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_count_bug"))
  }

  /** C43: TPC-H Q1 as literal shared SQL — D1 pins the DataFrame
    * formulation; this pins the SQL surface with the full spec shape
    * (ship-date cutoff, the three-factor charge expression, all four
    * averages), completing the 22/22 literal-SQL TPC-H sweep. One
    * fact scan, partial + final hash aggregate on two low-cardinality
    * flags — the canonical map-side-combine plan. */
  def sqlTpchQ1(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q1"))
  }

  /** C37: TPC-H Q2 (adapted — the fixture has no partsupp, so
    * "supplies the part" means "appears on a lineitem for it" and
    * min supply cost becomes min supplier account balance) as literal
    * shared SQL: the correlated scalar-MIN subquery is the q2
    * decorrelation shape — Catalyst rewrites it into an aggregate
    * joined back on the correlation key (one distributed plan), and
    * the region dims broadcast. DISTINCT collapses the lineitem
    * fan-in the missing partsupp uniqueness used to provide. */
  def sqlTpchQ2(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "nation", "region")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q2"))
  }

  /** C38: TPC-H Q9 (adapted — supply cost proxied at 60% of retail)
    * as literal shared SQL: the five-way star join grouped by
    * (nation, order year); every dim side broadcasts, the two fact
    * tables meet in one shuffle, and the profit expression stays
    * exact DECIMAL until the final per-group CAST. */
  def sqlTpchQ9(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "orders", "part", "supplier", "nation")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q9"))
  }

  /** C39: TPC-H Q11 (adapted — stock value = shipped lineitem value
    * for one nation's suppliers) as literal shared SQL: GROUP BY +
    * HAVING against an uncorrelated scalar subquery — the "share of
    * total" threshold shape; the scalar side is a 1-row broadcast,
    * and both comparison operands are exact DECIMAL. */
  def sqlTpchQ11(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "supplier", "nation")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q11"))
  }

  /** C40: TPC-H Q12 (adapted — mode = l_returnflag, lateness = ship
    * lag band, the C24 lateness convention) as literal shared SQL:
    * conditional two-way counts over one fact-fact join. */
  def sqlTpchQ12(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "orders")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q12"))
  }

  /** C41: TPC-H Q16 (adapted — supplier bridge via lineitem) as
    * literal shared SQL: NOT IN subquery (null-aware anti join) +
    * COUNT(DISTINCT) per part-attribute triple. */
  def sqlTpchQ16(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part", "supplier")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q16"))
  }

  /** C42: TPC-H Q20 (adapted — "excess availability" = supplier
    * shipped > 30% of the part's total quantity) as literal shared
    * SQL: a nested IN whose inner relation joins two grouped
    * aggregates of the same fact — the classic semi-join reduction. */
  def sqlTpchQ20(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "nation", "lineitem", "part")
      .foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q20"))
  }

  /** C22: LATERAL correlated subquery join as literal SQL (the C15
    * mechanism) — top-2 customers per nation via `LATERAL (… ORDER BY
    * … LIMIT 2)`: the SQL-standard formulation of per-group top-k.
    * Catalyst decorrelates the lateral subquery into a ranked join
    * (DomainJoin → window/limit per key) rather than executing it
    * per outer row — the difference between one distributed plan and
    * 25 (or at 100 TB, millions of) point queries; F3 pins the
    * DataFrame window formulation, this pins the SQL-surface one.
    * Inner AND outer ORDER BYs are fully tie-broken. */
  def sqlLateralTopk(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("nation", "customer").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_lateral_topk"))
  }

  /** C21: NULL-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the
    * dimension-lookup correctness trap: a plain equi join silently
    * DROPS every row whose key is NULL (NULL = NULL is NULL, not
    * true), so unknown-key facts vanish from the rollup and the
    * totals quietly stop reconciling. The null-safe operator treats
    * NULL as a JOINABLE value: unknown-key customers land on the
    * planted 'UNKNOWN' dimension row instead of disappearing — the
    * unknown-member convention every warehouse dimension carries.
    * `EqualNullSafe` is a hashable join key in Catalyst, so this
    * plans as a normal hash/sort-merge join (NULLs hash to one value
    * — a NULL-heavy fact side is a skew key like any other, handled
    * by the same AQE/salting toolbox as C12). Deterministic NULL
    * synthesis: every 10th customer's nation is unknown. */
  def joinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit(null))
          .otherwise(col("c_nationkey")).cast("long").as("nkey"),
        col("c_acctbal"))
    val dim = t(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("dkey"),
        col("n_name"))
      .unionAll(Seq((Option.empty[Long], "UNKNOWN")).toDF("dkey", "n_name"))
    cust.join(dim, col("nkey") <=> col("dkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        decSumDbl(col("c_acctbal")).as("acctbal_sum"))
      .orderBy(col("n_name"))
  }

  /** C20: TPC-H Q18 as literal SQL (same mechanism as C15) — the
    * "large-volume customer" shape: an IN subquery whose inner side is
    * an aggregate-HAVING over the FACT table itself. Catalyst must
    * plan the subquery as a semi join against the aggregated fact
    * (not a per-row subquery execution) and reuse the lineitem scan
    * across the two references — the self-referential filter pattern
    * every "orders above the 99th percentile" dashboard query takes.
    * Exact-decimal quantity sum and integer-cents ordering key. */
  def sqlTpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q18"))
  }

  /** C12: salted skew join — the shuffle-join counterpart of
    * D10 `agg_skew_salted`. A deterministic synthetic skew collapses a
    * third of lineitem onto one nation key (the "one hot key owns one
    * reducer" shape that stalls a plain shuffle join at 100 TB); the
    * fact side salts each row into one of 8 sub-keys (pure function of
    * the row, retry-stable), the dimension side replicates once per
    * salt, and the join runs on (key, salt) — the hot key's rows
    * spread across 8 tasks instead of 1. The merge hint forces the
    * shuffle path so the salted movement is what actually executes
    * (nation would otherwise broadcast at fixture scale, where salting
    * is moot). The salt never reaches the output; the oracle is the
    * plain unsalted join. */
  def joinSkewSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val salts = 8
    val facts = t(spark, sfDir, "lineitem")
      .select(col("l_quantity"),
        when(col("l_orderkey") % 3 === 0, 0L)
          .otherwise(col("l_orderkey") % 25).as("n_key"),
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)).as("salt"))
    val dim = t(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("n_key"), col("n_name"))
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
    facts.join(dim.hint("merge"), Seq("n_key", "salt"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"), decSumDbl(col("l_quantity")).as("sum_qty"))
      .orderBy(col("n_name"))
  }

  /** C24: TPC-H Q4-shaped EXISTS decorrelation as literal SQL (the C15
    * mechanism) — order counts per priority over a date window where
    * EXISTS a late-shipped line (shipdate > orderdate + 60 days; the
    * fixture carries no commitdate/receiptdate, so lateness is
    * derived from the columns it has). The point is the PLAN: Catalyst
    * must decorrelate the correlated EXISTS into a LEFT SEMI join on
    * l_orderkey = o_orderkey (one distributed pass over lineitem),
    * never a per-order point lookup — the difference between one
    * shuffle and millions of subquery executions at 100 TB. */
  def sqlTpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q4"))
  }

  /** C25: TPC-H Q13-shaped outer-join count distribution as literal
    * SQL — the "how many customers placed k orders" histogram. Two
    * traps it pins: (1) the priority filter sits in the JOIN ON
    * clause, NOT the WHERE — moving it to WHERE silently turns the
    * outer join inner and drops zero-order customers from the k=0
    * bucket; (2) `count(o_orderkey)` counts MATCHED rows only (NULL
    * never counts), which is what makes the left join a correct
    * zero-count. One shuffle on custkey, then a tiny re-agg on k. */
  def sqlTpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q13"))
  }

  /** C26: TPC-H Q21-shaped double-correlated EXISTS + NOT EXISTS as
    * literal SQL — "the supplier who was the SOLE late shipper on a
    * multi-supplier finished order", the hardest decorrelation shape
    * in the TPC-H suite: the same fact table is referenced three
    * times (l1 driving, l2 in EXISTS, l3 in NOT EXISTS), and the NOT
    * EXISTS arm correlates on BOTH l1.l_orderkey and the outer
    * o_orderdate. Catalyst must plan l2 as a left-semi and l3 as a
    * left-anti on the shared orderkey — three co-keyed shuffles that
    * AQE can co-locate, not nested loops. */
  def sqlTpchQ21(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "nation").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q21"))
  }

  /** C27: recursive CTE as literal SQL — the calendar-spine zero-fill
    * every reporting pipeline needs ("show EVERY month, 0 where
    * nothing happened"): WITH RECURSIVE generates the contiguous
    * month spine between the corpus min/max (integer month index
    * ym = year*12 + month, so the recursion is pure integer
    * arithmetic — no engine-specific date math), then LEFT JOINs the
    * sparse monthly aggregate (a deliberately thin orderkey slice so
    * the zero-fill arm actually exercises at fixture scale). Spark
    * 4's UnionLoopExec executes the recursion; depth here is the
    * month count (~80), far under the 100-level default. The loop
    * bound rides INSIDE the recursion (spine carries `hi` as a
    * column): joining the `bounds` CTE from the recursive step
    * instead re-aggregates the whole fact table EVERY iteration —
    * measured 12 s of redundant scans at sf0.1, a catastrophe at
    * 100 TB. With the bound carried, the recursion touches only the
    * 1-row previous step, and the fact side stays one aggregate +
    * one broadcast-able join. */
  def sqlRecursiveCte(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(graft.oracle.OracleSql.all("sql_recursive_cte"))
  }

  /** C28: SQL PIPE syntax (Spark 4's `|>` operators, the
    * GoogleSQL-pipes proposal) — the same scan → filter → derive →
    * aggregate → order pipeline a DataFrame chain expresses, written
    * as piped SQL: `FROM … |> WHERE … |> EXTEND … |> AGGREGATE …
    * GROUP BY … |> ORDER BY`. The surface is new; the PLAN must not
    * be — Catalyst lowers pipes to the same logical operators as the
    * classic formulation (the oracle is that classic SQL, so the
    * equality IS the lowering check), filter still pushed to the
    * scan, aggregate still partial. Exact cents derived once in the
    * EXTEND stage. */
  def sqlPipeSyntax(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """FROM lineitem
        ||> WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        ||> EXTEND CAST(round(l_extendedprice * (1.0 - l_discount) * 100,
        |     0) AS BIGINT) AS rc
        ||> AGGREGATE count(*) AS n_lines, CAST(sum(rc) AS BIGINT)
        |     AS rev_cents GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  /** C10: as-of join — for each purchase, the latest prior event of the
    * same user. Single window pass (lag over user_id), no join: the
    * 100 TB-safe as-of shape (one shuffle, no candidate blowup). */
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
      .withColumn("prev_event_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prev_event_id"),
        col("prev_event_type"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** C29: TPC-H Q6 (forecast-revenue change) as literal SQL — the
    * pure-scan rung of the literal-SQL family: no join at all, one
    * fact pass with three range predicates that must ALL reach the
    * parquet scan as PushedFilters, partial-aggregated map-side to a
    * single row. At 100 TB this is the query whose cost is exactly
    * "bytes the scan couldn't skip"; correctness rides exact DECIMAL
    * sums so engine disagreement is impossible. */
  def sqlTpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q6"))
  }

  /** C30: TPC-H Q8 (national market share) as literal SQL — the widest
    * snowflake of the family: EIGHT relations (nation twice), where
    * Catalyst must chain five dim broadcasts onto the two fact-fact
    * shuffles and the grouped division computes a share-of-total per
    * year from a conditional sum over the SAME aggregated rows (one
    * pass, no self-join against a totals frame). Volumes are exact
    * DECIMAL; the final ratio is rounded at 9 places so the one
    * genuinely float-valued step is pinned to a stable digit. */
  def sqlTpchQ8(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation",
      "region").foreach(tbl => t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q8"))
  }

  /** C31: TPC-H Q10 (returned-item reporting) as literal SQL — the
    * top-k-over-wide-groupBy shape: a quarter of orders joined to
    * returned lines, revenue per customer with the customer
    * attributes carried THROUGH the aggregate as group keys (the
    * wide-key groupBy a reporting workload actually emits), then
    * ORDER BY revenue LIMIT 20 which Spark executes as TakeOrdered —
    * no global sort materializes at any scale. Tie-broken on
    * c_custkey so the page is deterministic across engines. */
  def sqlTpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q10"))
  }

  /** C32: TPC-H Q14 (promotion effect) as literal SQL — conditional
    * share-of-total in ONE aggregate (promo revenue / all revenue
    * from the same month's lines), the single-pass numerator/
    * denominator idiom that replaces two scans or a self-join; the
    * part join must broadcast. Exact DECIMAL volumes, ratio rounded
    * at 9 places (the C30 discipline). */
  def sqlTpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q14"))
  }

  /** C33: TPC-H Q15 (top supplier) as literal SQL — a named CTE
    * aggregated once and consumed TWICE (join input + scalar MAX
    * subquery), the classic shared-subplan shape; revenue equality is
    * tested on the exact DECIMAL sum, never on a double, so the
    * argmax row set is engine-independent by construction. */
  def sqlTpchQ15(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "supplier").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q15"))
  }

  /** C34: TPC-H Q17 (small-quantity-order revenue) as literal SQL —
    * the correlated SCALAR AGGREGATE subquery (`l_quantity <
    * 0.2 * avg(l_quantity) per part`) Catalyst must decorrelate into
    * an aggregate-then-join, never a per-row re-scan; the quantity
    * average is exact (integral doubles summed under 2^53, one IEEE
    * divide both engines share), so the threshold comparison cannot
    * flap. Part side broadcasts after its brand+size prune. */
  def sqlTpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q17"))
  }

  /** C35: TPC-H Q19 (discounted revenue) as literal SQL — the
    * disjunction-of-conjunctions residual: three (brand, size-range,
    * quantity-range) arms OR'd together, where the only pushable
    * common factor is the join key itself; Catalyst must extract the
    * per-side common bounds it can (quantity/size envelopes), plan
    * ONE broadcast join, and evaluate the OR as a post-join filter —
    * the shape that catches optimizers that either give up (cartesian)
    * or over-push (wrong results). */
  def sqlTpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q19"))
  }

  /** C36: TPC-H Q22 (global-sales opportunity) as literal SQL,
    * adapted to this schema's columns (segment prefix stands in for
    * the phone country code): an uncorrelated scalar-aggregate
    * threshold plus a NOT EXISTS anti-join against orders — the
    * "customers above average with no pending order" shape combining
    * both subquery kinds in one query (the anti-join arm filters on
    * order STATUS because every fixture customer has some order —
    * the literal "no orders at all" form is vacuous at every scale). The average-balance threshold is
    * compared cross-multiplied (balance × count > exact-decimal sum)
    * so no engine-ordered float summation ever feeds a comparison. */
  def sqlTpchQ22(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach(tbl =>
      t(spark, sfDir, tbl).createOrReplaceTempView(tbl))
    spark.sql(graft.oracle.OracleSql.all("sql_tpch_q22"))
  }

  /** C46: BLOOM-PREFILTERED semi-join — fact rows whose part belongs
    * to a filtered dimension subset (`p_size = 1`, ~2% of parts),
    * with a [[graft.functions.BloomMightContainLong]] probe of the
    * subset's keys applied to the fact stream BEFORE the exact
    * semi-join. The band this exists for at 100 TB: a dimension
    * subset too big to broadcast forces the exact semi-join to
    * shuffle the FULL fact table; a 1%-fpp Bloom of the subset keys
    * is ~10× smaller than its hash relation, ships once per task as
    * an expression reference, and prunes the fact stream to
    * candidates before the exchange. Bloom filters have no false
    * negatives, so the exact join after the filter returns the
    * IDENTICAL row set (pinned in `JoinsSpec` against the
    * unfiltered form) — the probe only cuts the bytes that move; the
    * codegen'd expression rides inside the scan's WholeStageCodegen
    * span. Output is the per-flag aggregate so the checked result is
    * reporting-cardinality. */
  def joinBloomSemi(spark: SparkSession, sfDir: String): DataFrame =
    joinBloomSemiCore(spark, sfDir, bloomPrefilter = true)

  /** The C46 core with the prefilter switchable, so the spec can pin
    * bloom-on ≡ bloom-off row identity (the no-false-negatives law). */
  private[graft] def joinBloomSemiCore(spark: SparkSession, sfDir: String,
      bloomPrefilter: Boolean): DataFrame = {
    val dim = t(spark, sfDir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"))
    val li = t(spark, sfDir, "lineitem")
    val probe =
      if (!bloomPrefilter) li
      else {
        // the builder needs a capacity; the subset count is a
        // dimension-side action (dim-cardinality, never fact-scale)
        val n = math.max(dim.count(), 1L)
        val bloom = dim.stat.bloomFilter("l_partkey", n, 0.01)
        li.filter(graft.functions.BloomMightContainLong(
          col("l_partkey"), bloom))
      }
    probe.join(dim, Seq("l_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("l_quantity"))).as("qty_cents"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
      .withColumnRenamed("l_returnflag", "rf")
      .orderBy(col("rf"))
  }
}
