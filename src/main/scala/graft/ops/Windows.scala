package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Category E — window functions (SURVEY.md §2.2 E1-E6).
  *
  * Every window is partitioned (one shuffle on the partition key, sort
  * within partition). E6's global quartiles are computed as a two-pass
  * range-partitioned ranking (range bounds → local rank → cumulative
  * offset), so no single task ever sorts the world — see [[winNtilePct]].
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

  /** E9: time-INTERVAL range frame — the rolling-24-hour sum per user
    * (`RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW`):
    * E4's range frame bounds by a NUMERIC distance; the interval form
    * bounds by EVENT TIME, which is what every "value in the trailing
    * window" metric actually wants — and unlike a tumbling/sliding
    * pre-aggregation it is exact per event, not per bucket. Ties on
    * (user, ts) are frame PEERS — both engines include all peers, so
    * the result is deterministic without a unique tiebreak in the
    * frame order. Literal SQL via the C15 mechanism: the identical
    * text (including the interval literal) runs in both engines. */
  def winRangeTime(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "events").createOrReplaceTempView("events")
    spark.sql(graft.oracle.OracleSql.all("win_range_time"))
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

  /** E6: ntile / percent_rank / cume_dist over global order totals —
    * computed as a two-pass ranking instead of a single global window
    * (which sorts the world in one task): assign each row a range
    * bucket from driver-sampled literal boundaries, rank locally per
    * bucket, then add the cumulative count of the preceding buckets
    * (one row per bucket, broadcast). The ordering (tp_cents,
    * o_orderkey) is total, so rank = row_number and
    * ntile/percent_rank/cume_dist are closed-form in (rank, N) —
    * bit-identical to the single-window semantics the oracle computes.
    * One full-data shuffle (the hash exchange on the bucket id); the
    * boundary sampling and N are two lightweight scalar jobs. */
  def winNtilePct(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("tp_cents"))
    val n = base.count() // one scalar job; N parameterizes the closed forms
    // Deterministic range buckets: boundaries are sampled ONCE driver-side
    // and inlined as literals, so every plan branch buckets identically —
    // repartitionByRange would re-sample per materialized subtree and
    // correctness would hinge on exchange reuse (round-4 review finding).
    // Rank correctness does not depend on boundary VALUES (offsets are
    // computed from actual bucket counts), only on all branches agreeing.
    val bounds = base.stat
      .approxQuantile("tp_cents", (1 until 32).map(_ / 32.0).toArray, 0.001)
      .map(_.toLong).distinct.sorted
    // equal keys always share a bucket → ties can't straddle a boundary
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("tp_cents") > lit(b), 1).otherwise(0)
    }
    val parts = base.withColumn("pid", pid)
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("tp_cents"), col("o_orderkey"))
    val local = parts.withColumn("lrn", row_number().over(localW).cast("long"))
    // cumulative offsets: one row per bucket — trivially broadcast
    val offW = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(sum(col("cnt")).over(offW), lit(0L)).as("off"))
    val ranked = local.join(broadcast(offsets), Seq("pid"))
      .withColumn("rnk", col("off") + col("lrn"))
    // ntile(4): first (n mod 4) buckets get ceil(n/4) rows
    val q = n / 4
    val r = n % 4
    val thresh = (q + 1) * r
    val nt =
      if (q == 0) col("rnk").cast("int")
      else when(col("rnk") <= thresh,
          expr(s"CAST((rnk - 1) DIV ${q + 1} AS INT) + 1"))
        .otherwise(expr(s"CAST(${r} + (rnk - 1 - ${thresh}) DIV ${q} AS INT) + 1"))
    val pr =
      if (n <= 1) lit(0.0d)
      else (col("rnk") - 1).cast("double") / lit((n - 1).toDouble)
    ranked.select(col("o_orderkey"), col("tp_cents"),
        nt.as("nt"),
        pr.as("pr"),
        (col("rnk").cast("double") / lit(n.toDouble)).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** E7: first_value / last_value / nth_value over the FULL partition
    * frame — per order, the customer's first, last and second order
    * key by date. The frame is pinned to (unbounded preceding,
    * unbounded following) explicitly: `last_value` over the DEFAULT
    * frame (... current row) is the classic silent-wrong-answer trap —
    * it returns the current row. One shuffle on the partition key. */
  def winFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_orderkey"), col("o_custkey"), col("first_order"),
        col("last_order"), col("second_order"))
  }

  /** E8: IGNORE NULLS window navigation — the gap-filling semantics of
    * E7's value functions over a SPARSE column: a reading exists only
    * on every 3rd order (deterministic NULL synthesis — the fixture
    * has no NULLs), and per customer the query carries forward the
    * last known reading (`last_value IGNORE NULLS` over the running
    * frame — THE forward-fill primitive under J17's resample), plus
    * the first and second non-null readings over the full frame.
    * Without IGNORE NULLS each of these returns NULL whenever the
    * nearest row is a gap — the respect-nulls default is the second
    * classic window trap beside E7's default-frame one. One shuffle on
    * the partition key, two frames over the same sort. */
  def winIgnoreNulls(spark: SparkSession, sfDir: String): DataFrame = {
    val run = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, cents(col("o_totalprice")))
          .as("v"))
      .select(col("o_custkey"), col("o_orderkey"), col("v"),
        last(col("v"), ignoreNulls = true).over(run).as("ffill"),
        first(col("v"), ignoreNulls = true).over(full).as("first_nn"),
        nth_value(col("v"), 2, ignoreNulls = true).over(full)
          .as("second_nn"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** E12: RUNNING DISTINCT COUNT — per user, the number of distinct
    * event types seen SO FAR at each event: the "breadth of behavior
    * over time" metric. Windowed `COUNT(DISTINCT)` is unsupported in
    * both engines, and the `size(collect_set().over(w))` workaround
    * carries the whole set per row — O(cardinality) state per row and
    * a serialization bill that kills it at 100 TB. The scalable form
    * is pure arithmetic: flag each (user, type)'s FIRST occurrence
    * (`row_number` over the type refinement = 1), then a running SUM
    * of flags over the user's timeline — two windows sharing the same
    * user_id hash partitioning, O(1) per row. */
  def winRunningDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val wType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("first_seen",
        when(row_number().over(wType) === 1, 1L).otherwise(0L))
      .withColumn("n_types_so_far", sum(col("first_seen")).over(wRun))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("n_types_so_far"))
      .orderBy(col("event_id"))
  }

  /** E10: dedupe-to-LATEST-row-per-key — the single most common window
    * op in a warehouse (collapse a CDC/event stream to each key's
    * current row: `row_number() = 1` over (key, recency DESC with a
    * unique tie-break)): per customer, the FULL latest order row
    * survives. Distinct from F3's per-group top-k page: the semantics
    * here are key-cardinality output and whole-row retention — the
    * "current snapshot" view every `dropDuplicates`-by-recency need
    * actually wants (`dropDuplicates` itself keeps an ARBITRARY row —
    * input-order-dependent, the determinism contract forbids it). One
    * shuffle on the key; at 100 TB this is the read-side MoR collapse
    * the A34 write path avoids paying per batch. */
  /** E11: gaps-and-islands — per-user consecutive-active-DAY streaks
    * from the raw event stream, the classic island construction:
    * collapse to distinct (user, day), then `day_number − row_number`
    * is CONSTANT within a consecutive run (both advance by 1 per row)
    * and strictly drops across a gap, so grouping on that difference
    * labels every island without any self-join or iteration — two
    * shuffles total (distinct, then the window+agg reuse the same
    * user_id hash partitioning) where the naive "join each day to the
    * next" formulation is O(days²) per user. Output: per-user island
    * count, longest/total streak days, first/last active day. */
  def winGapIslands(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    t(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
      .withColumn("g", unix_date(col("d")) - row_number().over(w))
      .groupBy(col("user_id"), col("g"))
      .agg(min(col("d")).as("sd"), max(col("d")).as("ed"),
        count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("longest"),
        sum(col("len")).as("active_days"),
        min(col("sd")).as("first_day"),
        max(col("ed")).as("last_day"))
      .orderBy(col("user_id"))
  }

  def winDedupLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_odate").desc, col("o_orderkey").desc)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_odate"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("tp_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("o_custkey"))
  }

  /** E13: period-over-period change — weekly revenue with the
    * previous week's value and the percent change, the
    * week-over-week line every BI dashboard opens with: epoch-week
    * buckets (the J37 rule — calendar week functions disagree across
    * engines), exact integer cents, lag over the WEEK SPINE (the
    * window orders a handful of rows after the fact table collapsed
    * in a partial agg — never the raw events), one IEEE division
    * guarded NULL-on-zero. */
  def winPopChange(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = t(spark, sfDir, "events")
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') DIV 7")
        .cast("long").as("week"))
      .agg(sum(cents(col("value"))).as("revenue_cents"))
    val w = Window.orderBy(col("week"))
    weekly
      .withColumn("prev_cents", lag(col("revenue_cents"), 1).over(w))
      .withColumn("pct_change",
        when(col("prev_cents") =!= 0,
          round((col("revenue_cents") - col("prev_cents")).cast("double") /
            col("prev_cents").cast("double"), 6)))
      .orderBy(col("week"))
  }

  /** E12: longest strictly-increasing streak per user — the
    * MATCH_RECOGNIZE-style sequence detection Spark expresses with
    * lag + gaps-and-islands (the pattern behind "N consecutive days
    * of growth" alerts): per (user, day) the exact-integer daily
    * value total, an increase flag against the previous day, islands
    * numbered by the running count of breaks, and the max island
    * length per user. Comparisons run on integer cents (no float
    * boundary), windows partition by user (one shuffle, no global
    * sort), and the island trick turns run detection into two plain
    * aggregations — the same plan at any user count. */
  def winStreaks(spark: SparkSession, sfDir: String): DataFrame =
    streaksCore(t(spark, sfDir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("v")))

  /** E12 core over an arbitrary (user_id, day, v) daily frame — seam
    * for the known-log pins in `EventsSpec`. */
  def streaksCore(daily: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val flagged = daily
      .withColumn("brk",
        when(col("v") > lag(col("v"), 1).over(wu), 0L).otherwise(1L))
      .withColumn("island",
        sum(col("brk")).over(wu.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_id"))
      .agg(sum(col("run_len")).as("n_days"),
        max(col("run_len")).as("longest_up_run"))
      .orderBy(col("user_id"))
  }

  /** E15: exact LORENZ / PARETO concentration curve per group — "how
    * many top orders carry half the revenue, and what share does the
    * top decile hold" per priority, computed at VALUE-DOMAIN
    * cardinality (the D31-KS / D41-rank-map discipline): the naive
    * form windows a running sum over every ROW per group (one
    * reducer sorts the group at 100 TB); instead rows collapse to
    * per-(group, price) counts first, the cumulative sweep runs over
    * DISTINCT price rows (domain-bounded), and both report points
    * are recovered EXACTLY inside the boundary value's tie block
    * with integer arithmetic — ⌈·⌉ via (a + b − 1) DIV b, shares as
    * one exact-decimal division. All integers until the final
    * doubles, so the curve is engine- and partition-order-exact. */
  def winCumulativeShare(spark: SparkSession, sfDir: String): DataFrame =
    cumulativeShareCore(t(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("pri"),
        cents(col("o_totalprice")).as("tc")))

  /** The Lorenz core over an arbitrary (pri, tc) frame — separated so
    * `WindowsSpec` can pin the boundary-tie-block arithmetic on
    * constructed inputs (hand-checked crossing counts and shares). */
  private[graft] def cumulativeShareCore(rows: DataFrame): DataFrame = {
    val vals = rows
      .groupBy(col("pri"), col("tc"))
      .agg(count(lit(1)).as("cnt"))
    val wDesc = Window.partitionBy(col("pri")).orderBy(col("tc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("pri"))
    val swept = vals
      .select(col("pri"), col("tc"), col("cnt"),
        sum(col("cnt")).over(wDesc).as("cum_n"),
        sum(col("cnt") * col("tc")).over(wDesc).as("cum_cents"),
        sum(col("cnt")).over(wTot).as("n"),
        sum(col("cnt") * col("tc")).over(wTot).as("total_cents"))
      .withColumn("prev_n", col("cum_n") - col("cnt"))
      .withColumn("prev_cents", col("cum_cents") - col("cnt") * col("tc"))
    // the first (richest-first) value row where the running cents
    // reach HALF the total: the exact order count is completed inside
    // that row's tie block — ⌈(total − 2·prev) / 2·tc⌉ more orders
    val half = swept.filter(col("cum_cents") * 2 >= col("total_cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("pri")).orderBy(col("tc").desc)))
      .filter(col("rk") === 1)
      .select(col("pri"),
        // integer ceil-division — Spark `/` on longs is DOUBLE
        // division, so the DIV operator keeps this exact
        (col("prev_n") + expr(
          "(total_cents - 2 * prev_cents + 2 * tc - 1) DIV (2 * tc)"))
          .as("n_to_half"))
    // top-decile share: k = ⌈n/10⌉ orders; the boundary row's tie
    // block contributes (k − prev_n)·tc exactly
    val decile = swept
      .withColumn("k", expr("(n + 9) DIV 10"))
      .filter(col("cum_n") >= col("k"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("pri")).orderBy(col("tc").desc)))
      .filter(col("rk") === 1)
      .select(col("pri"), col("n"), col("total_cents"), col("k"),
        (col("prev_cents") + (col("k") - col("prev_n")) * col("tc"))
          .as("top_decile_cents"))
    decile.join(half, Seq("pri"))
      .select(col("pri"), col("n"), col("total_cents"),
        col("k").as("n_top_decile"),
        dbl(dec(col("top_decile_cents")) / col("total_cents"))
          .as("top_decile_share"),
        col("n_to_half"),
        dbl(dec(col("n_to_half")) / col("n")).as("frac_to_half"))
      .orderBy(col("pri"))
  }
}
